"""Typed configuration for the captioning pipeline.

Reference parity: the reference drives everything off a flat executable-Python
config module with ~80 knobs (reference code_src/config/cfg_wzn.py:1-126,
loaded via imp.load_source at code_src/config/configuration.py:28).  Here the
same knob surface is a typed dataclass with defaults equal to the reference's,
plus TPU-specific knobs (mesh shape, dtype, pallas toggles).  A Python file or
dict can still be used as the config source (``load_config``) so the
reference's "config file is the experiment record" workflow is preserved.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class Config:
    # ------------------------- paths (cfg_wzn.py:1-12) -------------------------
    experiment_path: str = "Experiments"
    vocab_path: str = "data/vocab.json"
    image_dir: str = "data/MSCOCO"
    resized_image_dir: str = "data/MSCOCO/resized"
    captions_val_origin: str = "data/MSCOCO/annotations/captions_val2014.json"
    captions_train_origin: str = "data/MSCOCO/annotations/captions_train2014.json"
    splited_anno_path_prefix: str = "data/annotations/karpathy_split_"
    train_anno_path: str = "data/annotations/karpathy_split_train.json"
    val_anno_path: str = "data/annotations/karpathy_split_val.json"
    test_anno_path: str = "data/annotations/karpathy_split_test.json"
    train_eval_anno_path: str = "data/annotations/karpathy_split_train_eval.json"

    # --------------------- model selection (cfg_wzn.py:15) ---------------------
    atten_model_name: str = "adaptive_attention"  # baseline_attention|adaptive_attention|rnn_attention

    # ------------------------- stage flags (cfg_wzn.py) ------------------------
    trainOrnot: bool = False            # cfg_wzn.py:18
    validOrnot: bool = False            # cfg_wzn.py:125
    testOrnot: bool = False             # cfg_wzn.py:79
    resizeOrnot: bool = False           # cfg_wzn.py:89
    vacab_build_Ornot: bool = False     # cfg_wzn.py:93 (reference's spelling kept)
    KarpathySplitOrnot: bool = False    # cfg_wzn.py:97

    # ----------------------------- train knobs ---------------------------------
    train_crop_size: int = 224          # cfg_wzn.py:19
    train_log_step: int = 10            # cfg_wzn.py:20
    train_random_seed: int = 123        # cfg_wzn.py:21
    train_pretrained: bool = False      # cfg_wzn.py:22
    train_pretrained_model: str = ""    # cfg_wzn.py:23
    train_num_epochs: int = 30          # cfg_wzn.py:24
    train_batch_size: int = 24          # cfg_wzn.py:25
    train_early_stop: bool = True       # cfg_wzn.py:28
    train_early_stop_patience: int = 6  # cfg_wzn.py:29
    train_evalOrnot: bool = False       # cfg_wzn.py:30
    train_tb_interval_batches: int = 1180  # cfg_wzn.py:31 (566748/24/20)
    train_tb_gradOrnot: bool = True     # cfg_wzn.py:32
    train_tb_lstm_clip_grad: bool = True  # cfg_wzn.py:33
    train_lstm_maxnormal: float = 5.0   # cfg_wzn.py:34
    # Train-time dropout at the reference's nn.Dropout sites (every affine
    # input, baseline_attention.py:26/73/111 etc. — rate HARDCODED to 0 there;
    # the author's notes flag it as an open knob, for_wzn:20,24, and the paper
    # trained with 0.5). 0.0 == the reference's exact behavior (ops/dropout.py).
    # Applies to the adam/sgd step; the L-BFGS closure stays deterministic
    # (line search re-evaluations must see one fixed loss surface).
    train_dropout_rate: float = 0.0

    # --------------------- optimization (cfg_wzn.py:37-75) ---------------------
    opt_fine_tune_cnn_start_layer: int = 5   # ResNet child index, cfg_wzn.py:39
    opt_fine_tune_cnn_start_epoch: int = 20  # cfg_wzn.py:40
    opt_lrdecay_patience: int = 3            # cfg_wzn.py:43
    opt_lrdecay_factor: float = 0.5          # cfg_wzn.py:44

    opt_rnn_optimization: str = "adam"       # adam|sgd|lbfgs, cfg_wzn.py:47
    opt_rnn_adam_alpha: float = 0.8          # beta1, cfg_wzn.py:48
    opt_rnn_adam_beta: float = 0.999         # beta2, cfg_wzn.py:49
    opt_rnn_adam_learning_rate: float = 1e-3  # cfg_wzn.py:50
    opt_rnn_adam_weight_decay: float = 0.0   # cfg_wzn.py:51
    opt_rnn_sgd_learning_rate: float = 5e-2  # cfg_wzn.py:53
    opt_rnn_sgd_momentum: float = 0.3        # cfg_wzn.py:54
    opt_rnn_sgd_weight_decay: float = 0.0    # cfg_wzn.py:55
    opt_rnn_lbfgs_lr: float = 0.5            # cfg_wzn.py:57
    opt_rnn_lbfgs_max_iter: int = 20         # cfg_wzn.py:58
    opt_rnn_lbfgs_history: int = 50          # cfg_wzn.py:59

    opt_cnn_optimization: str = "adam"       # cfg_wzn.py:63
    opt_cnn_adam_alpha: float = 0.8          # cfg_wzn.py:64
    opt_cnn_adam_beta: float = 0.999         # cfg_wzn.py:65
    opt_cnn_adam_learning_rate: float = 1e-5  # cfg_wzn.py:66
    opt_cnn_adam_weight_decay: float = 0.0   # cfg_wzn.py:67
    opt_cnn_sgd_learning_rate: float = 4e-5  # cfg_wzn.py:69
    opt_cnn_sgd_momentum: float = 0.99       # cfg_wzn.py:70
    opt_cnn_sgd_weight_decay: float = 0.0    # cfg_wzn.py:71
    opt_cnn_lbfgs_lr: float = 0.01           # cfg_wzn.py:73
    opt_cnn_lbfgs_max_iter: int = 20         # cfg_wzn.py:74
    opt_cnn_lbfgs_history: int = 50          # cfg_wzn.py:75

    # ----------------------------- eval knobs ----------------------------------
    test_pretrained_model: str = ""     # cfg_wzn.py:80
    valid_pretrained_model: str = ""    # cfg_wzn.py:126
    eval_batch_size: int = 400          # cfg_wzn.py:84
    dataloader_num_workers: int = 8     # cfg_wzn.py:86 (host-side prefetch threads here)
    decode_max_len: int = 30            # sampler max_len, baseline_attention.py:233
    beam_size: int = 1                  # 1 = greedy; reference had beam search only as a TODO (for_wzn:3)

    # ------------------------ preprocessing stages -----------------------------
    resized_image_size: int = 256       # cfg_wzn.py:90
    vocab_threshold: int = 5            # cfg_wzn.py:94

    # --------------------- Karpathy split (cfg_wzn.py:96-106) ------------------
    num_val: int = 5000
    num_test: int = 5000
    num_train_eval: int = 5000
    num_train_overfit: int = 20
    num_train_hyperparameter: int = 5000
    num_train_eval_hyperparameter: int = 1000
    num_val_hyperparameter: int = 1000

    # ------------------- per-model hparams (cfg_wzn.py:108-122) ----------------
    vocab_length: int = 10123           # statics:1 (set from vocab at runtime)
    # Pad the embedding/head vocab dim to a multiple (e.g. 128) for MXU lane
    # alignment + TP divisibility; padded logits are masked to -inf so the
    # softmax/argmax math is exactly the unpadded model's. 1 = no padding.
    vocab_pad_multiple: int = 1
    base_word_embed_size: int = 256
    base_lstm_hidden_size: int = 512
    adaptive_word_embed_size: int = 256
    adaptive_lstm_hidden_size: int = 512
    rnn_attention_bidirectional: bool = True
    rnn_attention_embed_size: int = 256
    rnn_attention_numlayers: int = 1
    rnn_attention_hiddensize: int = 512

    # ===================== TPU-native knobs (new in this rebuild) ==============
    # Encoder backbone: resnet152 for reference parity; smaller variants for
    # tests / ablations. Pretrained torch weights are ingested offline via
    # models/torch_import.py (no network access on TPU hosts).
    encoder_backbone: str = "resnet152"   # resnet18|34|50|101|152
    encoder_pretrained_npz: str = ""      # path to converted pretrained weights
    compute_dtype: str = "float32"        # float32|bfloat16 for activations
    param_dtype: str = "float32"
    use_pallas: str = "auto"              # auto|always|never — fused TPU kernels
    # Inference-only encoder quantization: 'int8' runs BN-folded convs on the
    # int8 MXU with dynamic per-tensor activation / per-channel weight scales
    # (post-training quantization; validate quality before production).
    encoder_quant: str = "none"           # none|int8
    # int8 activation-scale granularity: 'channel' calibrates one scale per
    # input channel and folds it into the conv kernels (models/infer.py::
    # _acc_i8) — better quantization SNR at identical runtime cost; 'tensor'
    # is the one-scale-per-conv fallback (required by the experimental fused
    # Pallas block/tail kernels).
    encoder_quant_granularity: str = "channel"  # channel|tensor
    # Sequential per-channel bias correction at calibration time (match each
    # conv's quantized pre-activation mean to the fp32 forward's on the
    # calibration batch; models/infer.py::calibrate_int8_bias). Zero runtime
    # cost, but MEASURED NEUTRAL on the trained-model gate (-0.045 vs -0.042
    # CIDEr without, VALIDATION.md) — per-channel scales already remove the
    # dominant systematic error, so this defaults off; revisit on real COCO.
    encoder_quant_bias_correct: bool = False
    # Decode-time sentinel h_{t-1}: the reference sampler feeds h_{t-1}=0 at
    # every decode step (adaptive_attention.py:116-122 with seq_len==1). Keep
    # False for checkpoint-fidelity with the reference; True uses the true
    # previous hidden (the paper's math) during sampling.
    sampler_sentinel_uses_prev_hidden: bool = False
    # Greedy decode EOS masking: reference decodes a fixed 30 steps with no
    # early exit (adaptive_attention.py:197-207). Post-<end> tokens are cut at
    # caption-build time either way (tools/utils.py:185-190), so masking does
    # not change outputs — but freezing finished rows lets XLA skip nothing;
    # kept as a knob for parity experiments.
    decode_eos_token: int = 2             # <end> id, build_vocab.py:50
    decode_start_token: int = 1           # <start> id, baseline_attention.py:255
    # Beam decode slot layout: True streams each image's V/pv into the fused
    # cell ONCE per step with W beam rows sharing the block (beam-major,
    # ops/pallas/fused_step.py); False is the escape hatch back to the tiled
    # per-row layout (V/pv repeated W times — the round-3-proven path).
    # Auto-falls back to tiled when the width is unsupported (lcm(8,W) > 64
    # would blow the kernel's row-block VMEM budget). Bit-identical outputs
    # either way (tests/test_beam_rescore.py).
    decode_beam_major: bool = True
    # Early-exit decode: stop the decode loop once EVERY row (greedy) /
    # every beam (beam search) has emitted <end>, instead of always running
    # decode_max_len steps (the reference's fixed-30 loop,
    # baseline_attention.py:233,263 — the default stays False for step-count
    # parity). Implemented as a lax.while_loop over the same step function
    # with preallocated output buffers; emitted ids are IDENTICAL (skipped
    # steps read as the <end> padding the fixed loop would have emitted),
    # attention/beta for steps after the global exit are zeros instead of
    # the fixed loop's post-<end> values (cut at <end> downstream anyway,
    # utils.py:185-190). Wins scale with how early the batch's longest
    # caption ends (COCO mean length 10.47 vs the 30-step cap, statics:11).
    decode_early_exit: bool = False
    # Two-phase early exit: with decode_early_exit=True, run the first N
    # steps as a fixed lax.scan and only the remaining decode_max_len - N
    # steps under the early-exit while_loop. Outputs stay bit-identical to
    # both the fixed loop and the pure while_loop; 0 keeps the pure
    # while_loop. Escape hatch only: the small-batch while penalty it was
    # built for was the unhoisted in-loop pad (fixed round 4); round-5
    # re-measurement shows the pure while_loop equal to the fixed scan at
    # every measured batch shape (VALIDATION.md round-5).
    decode_scan_prefix: int = 0
    # Mesh: axis names and sizes. -1 means "all remaining devices".
    mesh_axes: Tuple[str, ...] = ("data", "model")
    mesh_shape: Tuple[int, ...] = (-1, 1)
    # Gradient checkpointing for the encoder when memory-bound.
    remat_encoder: bool = False
    # Auto-resume (preemptible-run recovery): when set, training scans this
    # directory for the highest-epoch complete checkpoint and resumes from it
    # (full state: params, BN, optimizer moments, scheduler); when the
    # directory is empty or missing it starts fresh — the SAME config works
    # for the first start and every restart after preemption. The reference
    # requires hand-editing train_pretrained_model (cfg_wzn.py:22-23).
    train_auto_resume_dir: str = ""
    # Step-interval checkpoints INSIDE an epoch (0 = off, per-epoch only —
    # the reference's cadence, train.py:176-178). When > 0, every N steps a
    # 'cider-0.0000_model-E_step-K' checkpoint lands next to the per-epoch
    # ones carrying the full resume payload (params, BN, moments, rng stream,
    # epoch-loss accumulator, metric histories); auto-resume restarts at
    # exactly step K of epoch E — bit-identical to the uninterrupted run
    # (tests/test_step_resume.py). Stale step checkpoints are pruned once a
    # newer step/epoch checkpoint is durable. For COCO-scale epochs (~1h on
    # a single chip) this bounds preemption loss to N steps, not an epoch.
    train_checkpoint_every_steps: int = 0
    # Gradient accumulation: split each batch into this many microbatches
    # (lax.scan) and combine into the EXACT full-batch gradient (sum-of-NLL /
    # total-valid-count — see training/step.py). Trades step time for
    # activation memory: effective batch 512 fits where the monolithic step
    # OOMs. 1 = off (reference semantics; it has no accumulation).
    train_grad_accum_steps: int = 1
    # Optimizer-state placement on a mesh: "replicated" (default) or "data"
    # (ZeRO-1: Adam/SGD moments sharded over the data axis — same updates,
    # ~1/N the optimizer-state HBM per chip; parallel/mesh.py).
    opt_state_sharding: str = "replicated"
    # Multi-host: call jax.distributed.initialize() at startup (one process
    # per host; the same mesh code then spans all hosts' devices over DCN).
    distributed_init: bool = False

    # Derived / runtime fields (filled by Experiment.setup or stages).
    exp_dir: str = ""
    model_description: str = ""
    log_file: str = ""

    # ------------------------------------------------------------------ methods
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def word_embed_size(self) -> int:
        return {
            "baseline_attention": self.base_word_embed_size,
            "adaptive_attention": self.adaptive_word_embed_size,
            "rnn_attention": self.rnn_attention_embed_size,
        }[self.atten_model_name]

    @property
    def lstm_hidden_size(self) -> int:
        return {
            "baseline_attention": self.base_lstm_hidden_size,
            "adaptive_attention": self.adaptive_lstm_hidden_size,
            "rnn_attention": self.rnn_attention_hiddensize,
        }[self.atten_model_name]


_CONFIG_FIELDS = {f.name for f in dataclasses.fields(Config)}


def load_config(source: Any = None, **overrides) -> Config:
    """Build a Config from a Python file path, dict, or keyword overrides.

    Mirrors the reference's exec-a-Python-file config loading
    (configuration.py:25-40) without the `imp` machinery: module-level
    variables in the file whose names match Config fields become field values;
    unknown names are ignored (the reference tolerated arbitrary extras too).
    """
    values: Dict[str, Any] = {}
    if isinstance(source, str) and source.endswith(".py"):
        ns: Dict[str, Any] = {}
        with open(source) as f:
            exec(compile(f.read(), source, "exec"), ns)  # noqa: S102 - by design
        values = {k: v for k, v in ns.items() if k in _CONFIG_FIELDS}
        # Helper variables in the file are legitimate (the reference's config
        # builds paths from other paths, cfg_wzn.py:1-12) — but a NEAR-MISS
        # of a real knob is almost certainly a typo that would otherwise be
        # ignored silently (e.g. num_epochs vs train_num_epochs). Warn, loud.
        import difflib
        import types

        for k, v in ns.items():
            if (k.startswith("_") or k in _CONFIG_FIELDS
                    or callable(v) or isinstance(v, types.ModuleType)):
                continue
            # knob names group by trailing words (…_embed_size, …_num_epochs):
            # a long shared suffix is the strongest typo signal, so rank by
            # it first (train_hidden_size -> …_attention_hidden_size, which
            # edit distance alone would miss), then fall back to difflib
            suffix = lambda a, b: len(  # noqa: E731
                os.path.commonprefix([a[::-1], b[::-1]]))
            by_suffix = max(sorted(_CONFIG_FIELDS), key=lambda f: suffix(k, f))
            if suffix(k, by_suffix) >= 8:
                hint = [by_suffix]
            else:
                hint = difflib.get_close_matches(k, _CONFIG_FIELDS, n=1, cutoff=0.7)
            if hint:
                print(f"[config] WARNING: '{k}' in {source} is not a Config "
                      f"field and was IGNORED — did you mean '{hint[0]}'?")
    elif isinstance(source, str) and source.endswith(".json"):
        with open(source) as f:
            raw = json.load(f)
        values = {k: v for k, v in raw.items() if k in _CONFIG_FIELDS}
    elif isinstance(source, dict):
        values = {k: v for k, v in source.items() if k in _CONFIG_FIELDS}
    elif isinstance(source, Config):
        values = source.to_dict()
    elif source is not None:
        raise TypeError(f"Unsupported config source: {type(source)}")

    values.update({k: v for k, v in overrides.items() if k in _CONFIG_FIELDS})
    unknown = set(overrides) - _CONFIG_FIELDS
    if unknown:
        raise KeyError(f"Unknown config fields: {sorted(unknown)}")
    # Tuple-typed fields may arrive as lists from JSON.
    for k in ("mesh_axes", "mesh_shape"):
        if k in values and isinstance(values[k], list):
            values[k] = tuple(values[k])
    cf = Config(**values)
    _validate(cf)
    return cf


def _validate(cf: Config):
    """Fail fast on invalid enum knobs (before any data loading starts)."""
    variants = ("baseline_attention", "adaptive_attention", "rnn_attention")
    if cf.atten_model_name not in variants:
        raise ValueError(
            f"atten_model_name={cf.atten_model_name!r} — must be one of {variants}"
        )
    for knob in ("opt_rnn_optimization", "opt_cnn_optimization"):
        v = getattr(cf, knob)
        if v not in ("adam", "sgd", "lbfgs"):
            raise ValueError(f"{knob}={v!r} — must be adam|sgd|lbfgs")
    if cf.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"compute_dtype={cf.compute_dtype!r}")
    if cf.use_pallas not in ("auto", "always", "never"):
        raise ValueError(f"use_pallas={cf.use_pallas!r}")
    if cf.encoder_quant not in ("none", "int8"):
        raise ValueError(f"encoder_quant={cf.encoder_quant!r} — must be none|int8")
    if cf.encoder_quant_granularity not in ("channel", "tensor"):
        raise ValueError(
            f"encoder_quant_granularity={cf.encoder_quant_granularity!r} — "
            "must be channel|tensor"
        )
    if cf.opt_state_sharding not in ("replicated", "data"):
        raise ValueError(
            f"opt_state_sharding={cf.opt_state_sharding!r} — must be replicated|data"
        )
    if not 0.0 <= cf.train_dropout_rate < 1.0:
        raise ValueError(
            f"train_dropout_rate={cf.train_dropout_rate} — must be in [0, 1) "
            "(0 disables dropout, matching the reference's hardcoded Dropout(0))"
        )
    if cf.train_grad_accum_steps < 1:
        raise ValueError(
            f"train_grad_accum_steps={cf.train_grad_accum_steps} — must be >= 1"
        )
    if cf.train_batch_size % max(1, cf.train_grad_accum_steps) != 0:
        raise ValueError(
            f"train_grad_accum_steps={cf.train_grad_accum_steps} must divide "
            f"train_batch_size={cf.train_batch_size}"
        )
    if cf.train_grad_accum_steps > 1 and "lbfgs" in (
        cf.opt_rnn_optimization, cf.opt_cnn_optimization
    ):
        # the L-BFGS closure step (training/lbfgs.py) is monolithic; accepting
        # the knob there would silently skip the requested microbatching
        raise NotImplementedError(
            "train_grad_accum_steps > 1 is not supported with lbfgs optimizer groups"
        )
    if cf.atten_model_name == "rnn_attention" and cf.rnn_attention_numlayers != 1:
        # accepted-but-ignored knobs must fail loudly, not run silently wrong:
        # only the 1-layer attention LSTM is implemented (ops/attention.py:91-121;
        # the reference default is 1, rnn_attention.py:25). Other variants never
        # read this knob (the reference also ignores it there), so they pass.
        raise NotImplementedError(
            f"rnn_attention_numlayers={cf.rnn_attention_numlayers} — only 1 "
            "layer is implemented"
        )
