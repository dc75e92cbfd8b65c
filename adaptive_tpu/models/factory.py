"""Model factory: config -> CaptionModel (encoder + decoder variant).

Reference parity: model_factory.get_model (code_src/models/model_factory.py:
5-23) — name dispatch over {baseline_attention, adaptive_attention,
rnn_attention}, optional checkpoint restore with the start epoch parsed from
the checkpoint filename (model_factory.py:15-19). The reference's
rnn_attention construction crashes on a missing cf arg (rnn_attention.py:92);
here it is constructed correctly.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from adaptive_tpu.models import decoders as D
from adaptive_tpu.models import encoder as E
from adaptive_tpu.models import resnet as R

VARIANTS = ("baseline_attention", "adaptive_attention", "rnn_attention")


class CaptionModel(NamedTuple):
    """Static model description + pure apply functions bound to it."""

    variant: str
    arch: str
    spec: D.DecoderSpec
    crop_size: int
    compute_dtype: Any
    use_pallas: bool = False
    # Run the Pallas kernels through the interpreter (CPU tests of the fused
    # decode path, incl. under shard_map meshes). Never set on real TPU.
    pallas_interpret: bool = False
    remat_encoder: bool = False
    # Train-time dropout rate at the reference's (hardcoded-zero) Dropout
    # sites (ops/dropout.py; config knob train_dropout_rate). 0.0 == the
    # reference's exact behavior; the paper trained with 0.5.
    dropout_rate: float = 0.0
    encoder_quant: str = "none"  # none | int8 (PTQ, inference only)
    # Calibrated {conv_name: float} input scales for int8 (host constants,
    # baked into the jit). None -> dynamic per-batch scales. Produce with
    # models.infer.calibrate_int8 and attach via model._replace(int8_scales=...).
    int8_scales: Any = None
    # Per-out-channel bias corrections from calibrate_int8_bias (zero runtime
    # cost: they add into the conv biases); attached by calibrate_model when
    # encoder_quant_bias_correct is on.
    int8_bias_corr: Any = None
    # Layers whose identity bottleneck blocks run the fused Pallas block
    # kernel on the int8 carry path (ops/pallas/fused_block.py). "auto" picks
    # the measured-win set when use_pallas is on; tuple of layer names to
    # override; () disables.
    int8_fused_layers: Any = "auto"
    # Layers whose identity-block tails fuse with the next block's conv1
    # (ops/pallas/fused_tail.py) on the int8 carry path. Same auto contract.
    int8_fused_tails: Any = "auto"
    # Space-to-depth stem on the int8 carry path: rewrite the 7x7/s2 conv1 as
    # a bit-exact s2d + 4x4/s1 conv (models/infer.py::_stem_s2d_kernel).
    # "auto" follows the measured default; True/False overrides.
    int8_stem_s2d: Any = "auto"

    # ------------------------------------------------------------------ init
    def init(self, key) -> Tuple[Dict, Dict]:
        ke, kd = jax.random.split(key)
        enc_params, enc_state = E.init_encoder(
            ke, self.spec.embed_size, self.spec.hidden_size, self.arch
        )
        params = {"encoder": enc_params, "decoder": init_decoder_tree(kd, self.spec)}
        return params, enc_state

    # ---------------------------------------------------------------- encode
    def encode(self, params, state, images, train: bool = False, drop=None):
        """Preprocessed float images NHWC -> (V, v_g, h0, c0, state').

        drop: train-time dropout closure (ops/dropout.py) — closed over, not
        passed through jax.checkpoint (a callable is not a pytree); masks are
        deterministic in the step rng so remat replays identical bits."""

        def apply(p, s, im):
            return E.encoder_apply(p, s, im, self.arch, train, drop=drop)

        if self.remat_encoder and train:
            # trade ~2x encoder FLOPs for not materializing ResNet activations
            # across the backward pass (jax.checkpoint / rematerialization)
            apply = jax.checkpoint(apply, policy=None)
        return apply(params["encoder"], state, images.astype(self.compute_dtype))

    def _resolved_fusion(self):
        """(fused_layers, fused_tails, stem_s2d) with 'auto' resolved."""
        fused = self.int8_fused_layers
        if fused == "auto":
            # No measured-win set yet: the roll-based tap generation costs
            # more than the fusion saves on every layer (VALIDATION.md round
            # 3 fused-block table), so auto stays empty until a layer wins.
            fused = ()
        tails = self.int8_fused_tails
        if tails == "auto":
            # Measured net loss on every layer tried: the custom-call splits
            # XLA's conv2+epilogue+conv3 mega-fusion (VALIDATION.md round-3
            # fused-tail ladder), so auto stays empty.
            tails = ()
        s2d = self.int8_stem_s2d
        if s2d == "auto":
            # measured win with prepared weights + per-channel scales:
            # 8,684 vs 8,648 captions/s (3-run means, batch 1024, v5e —
            # VALIDATION.md round-3). Bit-exact rewrite, so auto is on —
            # except for odd crops: s2d packs 2x2 pixel blocks.
            s2d = self.crop_size % 2 == 0
        elif s2d and self.crop_size % 2:
            raise ValueError(
                "int8_stem_s2d=True requires an even input size (space-to-"
                f"depth packs 2x2 pixel blocks) but crop_size={self.crop_size}"
                " is odd — use an even train_crop_size or int8_stem_s2d=False"
            )
        return fused, tails, bool(s2d)

    def encode_inference(self, params, state, images, prepared=None):
        """BN-folded, dtype-cast encoder forward for the decode hot path
        (models/infer.py). Same outputs as encode(train=False); optionally
        int8-quantized convs (encoder_quant='int8'). prepared: tree from
        prepare_inference — same math with every weight pass hoisted out."""
        from adaptive_tpu.models.infer import encoder_apply_inference

        fused, tails, s2d = self._resolved_fusion()
        return encoder_apply_inference(
            params["encoder"] if prepared is None else None, state, images,
            self.arch, self.compute_dtype,
            quant=self.encoder_quant, scales=self.int8_scales,
            fused_layers=fused, fused_tails=tails, stem_s2d=s2d,
            prepared=None if prepared is None else prepared["encoder"],
            bias_corr=self.int8_bias_corr,
        )

    def prepare_inference(self, params, state, with_head: bool = True):
        """Offline per-checkpoint weight preparation for the decode jits:
        {'encoder': prepare_encoder_inference tree, 'decoder': compute-dtype
        decoder params, 'head': padded greedy vocab head or None}. The decode
        programs consume this instead of re-deriving the BN fold / int8
        quantization / dtype casts every batch (models/infer.py). jit it —
        one compiled program per checkpoint. with_head=False skips the
        padded greedy head (beam decoding never reads it — ~10 MB at COCO
        vocab)."""
        from adaptive_tpu.models.infer import cast_floating, prepare_encoder_inference

        fused, tails, s2d = self._resolved_fusion()
        enc = prepare_encoder_inference(
            params["encoder"], state, self.arch, self.compute_dtype,
            quant=self.encoder_quant, scales=self.int8_scales, stem_s2d=s2d,
            # the fused Pallas experiments quantize from raw folded kernels
            # inside the decode program — prep then hoists only the BN fold
            quantize_weights=not (fused or tails),
            bias_corr=self.int8_bias_corr,
        )
        dec = cast_floating(params["decoder"], self.compute_dtype)
        return {
            "encoder": enc,
            "decoder": dec,
            "head": self.prepare_greedy_head({"decoder": dec}) if with_head else None,
        }

    # --------------------------------------------------------------- forward
    def forward(self, params, state, images, captions, train: bool = False,
                dropout_rng=None):
        """Teacher-forced scores: (scores [B,T,vocab], (alpha, beta), state').

        Parity: Encoder2Decoder.forward (baseline_attention.py:206-230) minus
        the packing — padded scores + loss masking replace pack_padded_sequence
        (see training/step.py). dropout_rng activates train-time dropout when
        dropout_rate > 0 (ops/dropout.py; identity otherwise).
        """
        from adaptive_tpu.ops.dropout import make_dropout

        drop = make_dropout(dropout_rng, self.dropout_rate) if train else None
        V, v_g, h0, c0, new_state = self.encode(params, state, images, train, drop)
        scores, alpha, beta = D.decoder_forward(
            params["decoder"], self.spec, V, v_g, captions, h0, c0, drop=drop
        )
        return scores, (alpha, beta), new_state

    # ----------------------------------------------------------- decode step
    def decode_step(self, params, token, v_g, dstate, V, sentinel_uses_prev_hidden=False, pv=None):
        return D.decode_step(
            params["decoder"], self.spec, token, v_g, dstate, V,
            sentinel_uses_prev_hidden, pv=pv, use_pallas=self.use_pallas,
            interpret=self.pallas_interpret,
        )

    def greedy_decode_step(self, params, token, v_g, dstate, V,
                           sentinel_uses_prev_hidden=False, pv=None, head=None,
                           tp_axis=None, head_tp=False):
        """Greedy variant returning next-token ids directly; with Pallas +
        adaptive, the vocab head + argmax fuse (no logits in HBM).
        tp_axis/head_tp: shard_map tensor parallelism (decoding/spmd.py)."""
        return D.greedy_decode_step(
            params["decoder"], self.spec, token, v_g, dstate, V,
            sentinel_uses_prev_hidden, pv=pv, head=head, use_pallas=self.use_pallas,
            tp_axis=tp_axis, head_tp=head_tp, interpret=self.pallas_interpret,
        )

    def beam_decode_step(self, params, token, v_g, dstate, V, k,
                         sentinel_uses_prev_hidden=False, pv=None, head=None,
                         beam_w=1, tp_axis=None, head_tp=False):
        """Beam variant returning each row's top-k normalized log-probs +
        token ids; with Pallas + adaptive, the vocab head, per-row top-k and
        log-softmax normalizer fuse (no logits in HBM). beam_w > 1 takes
        UNTILED V/pv (beam-major slot sharing in the fused cell).
        tp_axis/head_tp: shard_map tensor parallelism (decoding/spmd.py)."""
        return D.beam_decode_step(
            params["decoder"], self.spec, token, v_g, dstate, V, k,
            sentinel_uses_prev_hidden, pv=pv, head=head, use_pallas=self.use_pallas,
            beam_w=beam_w, tp_axis=tp_axis, head_tp=head_tp,
            interpret=self.pallas_interpret,
        )

    def prepare_greedy_head(self, params):
        """Hoisted padded vocab head for greedy_decode_step (None when the
        fused path is off — the fallback reads the mlp params directly)."""
        if not (self.use_pallas and self.spec.variant == "adaptive_attention"):
            return None
        return D.prepare_greedy_head(params["decoder"], self.spec)

    def precompute_slots(self, params, V):
        """V @ Wv once per image — loop-invariant across decode steps (the
        reference recomputes it every token, baseline_attention.py:86)."""
        from adaptive_tpu.ops import attention as att

        return att.precompute_slots(params["decoder"]["adaptive"]["atten"], V)

    def init_decode_state(self, h0, c0) -> D.DecodeState:
        return D.DecodeState(h=h0, c=c0, h_prev=jnp.zeros_like(h0))


def init_decoder_tree(key, spec: D.DecoderSpec) -> Dict:
    return D.init_decoder(key, spec)


def build_model(cf) -> CaptionModel:
    if cf.atten_model_name not in VARIANTS:
        raise ValueError(f"unknown atten_model_name {cf.atten_model_name!r}")
    if cf.atten_model_name == "rnn_attention" and cf.rnn_attention_numlayers != 1:
        # never run an accepted-but-ignored knob silently wrong (only the
        # 1-layer attention LSTM of rnn_attention.py:25 is implemented);
        # other variants never read the knob — same as the reference.
        raise NotImplementedError(
            f"rnn_attention_numlayers={cf.rnn_attention_numlayers} — only 1 "
            "layer is implemented"
        )
    num_slots = (cf.train_crop_size // 32) ** 2  # 49 at 224 (7x7 map)
    m = max(1, cf.vocab_pad_multiple)
    padded_vocab = ((cf.vocab_length + m - 1) // m) * m
    spec = D.DecoderSpec(
        variant=cf.atten_model_name,
        embed_size=cf.word_embed_size,
        hidden_size=cf.lstm_hidden_size,
        vocab_size=cf.vocab_length,
        num_slots=num_slots,
        atten_dim=num_slots,  # reference ties the attention dim to 49 slots
        rnn_bidirectional=cf.rnn_attention_bidirectional,
        rnn_num_layers=cf.rnn_attention_numlayers,
        padded_vocab=padded_vocab if padded_vocab != cf.vocab_length else 0,
    )
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cf.compute_dtype]
    use_pallas = cf.use_pallas == "always" or (
        cf.use_pallas == "auto" and jax.default_backend() == "tpu"
    )
    return CaptionModel(
        variant=cf.atten_model_name,
        arch=cf.encoder_backbone,
        spec=spec,
        crop_size=cf.train_crop_size,
        compute_dtype=dtype,
        use_pallas=use_pallas,
        remat_encoder=cf.remat_encoder,
        encoder_quant=getattr(cf, "encoder_quant", "none"),
        dropout_rate=float(getattr(cf, "train_dropout_rate", 0.0)),
    )


def get_model(cf, key: Optional[jax.Array] = None):
    """(model, params, state, start_epoch) — with optional checkpoint restore
    (model_factory.py:14-21: start epoch parsed from '...-N.pkl')."""
    model = build_model(cf)
    key = key if key is not None else jax.random.PRNGKey(cf.train_random_seed)
    # jitted init: one compiled program; eager init dispatches ~100 separate
    # RNG jits (minutes on a slow host, seconds jitted)
    params, state = jax.jit(model.init)(key)
    start_epoch = 1
    # Order matters: pretrained ImageNet weights are the *base* (the reference
    # loads them at construction, baseline_attention.py:16); a training
    # checkpoint restores OVER them — never the reverse, or a resume would
    # silently reset a fine-tuned encoder + BN stats to ImageNet.
    if cf.encoder_pretrained_npz:
        from adaptive_tpu.models import torch_import

        params, state = torch_import.load_pretrained_resnet(
            cf.encoder_pretrained_npz, params, state
        )
    if cf.train_pretrained and cf.train_pretrained_model:
        from adaptive_tpu.training import checkpoint as ckpt

        params, state = ckpt.restore_model(cf.train_pretrained_model, params, state)
        start_epoch = ckpt.epoch_from_filename(cf.train_pretrained_model) + 1
    return model, params, state, start_epoch
