"""Caption decoders: baseline / adaptive (visual sentinel) / rnn attention.

Reference parity:
* baseline  — code_src/models/baseline_attention.py:100-194 (Decoder +
  AdaptiveBlock without sentinel: scores = mlp(c + h))
* adaptive  — code_src/models/adaptive_attention.py:89-155 (sentinel s_t from
  (x_t, h_{t-1}, c_t); 50-slot concat softmax beta; scores = mlp(c_hat + h))
* rnn       — code_src/models/rnn_attention.py:70-83 (sigmoid-gated slots
  aggregated by a (bi)LSTM; scores = mlp(F_T + h))

TPU-first: teacher forcing runs the LSTM via one lax.scan (ops/lstm.py) and
the attention block batched over all T timesteps at once (as the reference
does, baseline_attention.py:184-189); single-token `decode_step` powers the
scan-based greedy/beam decoders in adaptive_tpu.decoding.

The adaptive sentinel's h_{t-1} sequence is [0, h_1, ..., h_{T-1}] — the
reference shifts with a ZERO h0, not the encoder-provided h0
(adaptive_attention.py:116-122), and its sampler (seq len 1 per call) feeds
h_{t-1}=0 at every decode step. Both behaviors are reproduced; decode can opt
into the true previous hidden via cf.sampler_sentinel_uses_prev_hidden.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from adaptive_tpu.ops import attention as att
from adaptive_tpu.ops import inits
from adaptive_tpu.ops.lstm import lstm_cell, lstm_scan


class DecoderSpec(NamedTuple):
    variant: str  # baseline_attention | adaptive_attention | rnn_attention
    embed_size: int
    hidden_size: int
    vocab_size: int
    num_slots: int = 49  # 7x7 feature map
    atten_dim: int = 49  # projection dim inside additive attention (== slots in ref)
    rnn_bidirectional: bool = True
    rnn_num_layers: int = 1
    # vocab dim of the embedding/head params; > vocab_size when padded for
    # MXU lane alignment / TP divisibility. Padded logits are masked to -inf.
    padded_vocab: int = 0

    @property
    def vocab_param_dim(self) -> int:
        return self.padded_vocab or self.vocab_size


# ----------------------------------------------------------------------- init
def init_decoder(key, spec: DecoderSpec) -> Dict:
    ke, kl, ka = jax.random.split(key, 3)
    p: Dict[str, Any] = {
        # torch nn.Embedding default init: N(0, 1) (not re-initialized in ref)
        "embed": jax.random.normal(ke, (spec.vocab_param_dim, spec.embed_size), jnp.float32),
        "lstm": inits.lstm_init(kl, 2 * spec.embed_size, spec.hidden_size),
        "adaptive": _init_adaptive_block(ka, spec),
    }
    return p


def _init_adaptive_block(key, spec: DecoderSpec) -> Dict:
    H, D = spec.hidden_size, spec.atten_dim
    k = iter(jax.random.split(key, 10))
    mlp_in = H
    block: Dict[str, Any] = {}

    if spec.variant == "baseline_attention":
        # Atten inits: v/g xavier_normal(tanh), h kaiming_normal(relu)
        # (baseline_attention.py:75-76)
        block["atten"] = {
            "affine_v": inits.linear_params(next(k), H, D, "xavier_normal", "tanh", bias=False),
            "affine_g": inits.linear_params(next(k), H, D, "xavier_normal", "tanh", bias=False),
            "affine_h": inits.linear_params(next(k), D, 1, "kaiming_normal", "relu", bias=False),
        }
    elif spec.variant == "adaptive_attention":
        # Atten inits: v/g/s xavier_uniform(tanh), h kaiming_normal(relu)
        # (adaptive_attention.py:23-24); Sentinel: xavier_uniform(sigmoid) (:73)
        block["atten"] = {
            "affine_v": inits.linear_params(next(k), H, D, "xavier_uniform", "tanh", bias=False),
            "affine_g": inits.linear_params(next(k), H, D, "xavier_uniform", "tanh", bias=False),
            "affine_s": inits.linear_params(next(k), H, D, "xavier_uniform", "tanh", bias=False),
            "affine_h": inits.linear_params(next(k), D, 1, "kaiming_normal", "relu", bias=False),
        }
        block["sentinel"] = {
            "affine_x": inits.linear_params(next(k), 2 * spec.embed_size, H, "xavier_uniform", "sigmoid", bias=False),
            "affine_h": inits.linear_params(next(k), H, H, "xavier_uniform", "sigmoid", bias=False),
        }
    elif spec.variant == "rnn_attention":
        # Atten inits: v/g xavier_uniform(tanh), h xavier_uniform(sigmoid)
        # (rnn_attention.py:27-28); aggregator LSTM lstm_init (:29)
        hr = spec.hidden_size // 2 if spec.rnn_bidirectional else spec.hidden_size
        block["atten"] = {
            "affine_v": inits.linear_params(next(k), H, D, "xavier_uniform", "tanh", bias=False),
            "affine_g": inits.linear_params(next(k), H, D, "xavier_uniform", "tanh", bias=False),
            "affine_h": inits.linear_params(next(k), D, 1, "xavier_uniform", "sigmoid", bias=False),
            "lstm_fwd": inits.lstm_init(next(k), H, hr),
        }
        if spec.rnn_bidirectional:
            block["atten"]["lstm_bwd"] = inits.lstm_init(next(k), H, hr)
    else:
        raise ValueError(f"unknown variant {spec.variant}")

    # Final vocab head: kaiming_normal(relu) (baseline_attention.py:114,
    # adaptive_attention.py:108)
    block["mlp"] = inits.linear_params(
        next(k), mlp_in, spec.vocab_param_dim, "kaiming_normal", "relu"
    )
    return block


def mask_padded_vocab(spec: DecoderSpec, scores: jnp.ndarray) -> jnp.ndarray:
    """-inf out logits of vocab-padding columns so softmax/argmax equal the
    unpadded model exactly."""
    if not spec.padded_vocab or spec.padded_vocab == spec.vocab_size:
        return scores
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
    return jnp.where(col < spec.vocab_size, scores, neg)


# --------------------------------------------------------- adaptive block fwd
def adaptive_block_apply(
    block: Dict, spec: DecoderSpec, x: jnp.ndarray, hiddens: jnp.ndarray,
    cells: jnp.ndarray, V: jnp.ndarray, h_prev: Optional[jnp.ndarray] = None,
    pv: Optional[jnp.ndarray] = None, drop=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """(scores [B,T,vocab], alpha [B,T,K], beta or None).

    h_prev: [B,T,H] previous-step hiddens for the sentinel; if None, uses the
    reference's zero-prefixed shift of `hiddens` (adaptive_attention.py:116-122).
    pv: optional precomputed V @ Wv (loop-invariant across decode steps).
    drop: train-time dropout at the reference's Dropout sites (every affine
    input incl. the vocab mlp, adaptive_attention.py:132 — ops/dropout.py).
    """
    from adaptive_tpu.ops.dropout import maybe_drop as _d

    if spec.variant == "baseline_attention":
        c, alpha = att.spatial_attention(block["atten"], V, hiddens, pv, drop)
        scores = inits.linear(block["mlp"], _d(drop, c + hiddens))
        return scores, alpha, None

    if spec.variant == "adaptive_attention":
        if h_prev is None:
            zero = jnp.zeros_like(hiddens[:, :1, :])
            h_prev = jnp.concatenate([zero, hiddens[:, :-1, :]], axis=1) if hiddens.shape[1] > 1 else zero
        s = att.sentinel_gate(block["sentinel"], x, h_prev, cells, drop)
        c_hat, alpha, beta = att.adaptive_attention(block["atten"], V, hiddens, s, pv, drop)
        scores = inits.linear(block["mlp"], _d(drop, c_hat + hiddens))
        return scores, alpha, beta

    if spec.variant == "rnn_attention":
        f, alpha = att.recurrent_attention(
            block["atten"], V, hiddens, spec.rnn_bidirectional, pv, drop
        )
        scores = inits.linear(block["mlp"], _d(drop, f + hiddens))
        return scores, alpha, None

    raise ValueError(spec.variant)


# ------------------------------------------------------------ teacher forcing
def decoder_forward(
    params: Dict, spec: DecoderSpec, V: jnp.ndarray, v_g: jnp.ndarray,
    captions: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray, drop=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Teacher-forced scores for all timesteps (Decoder.forward,
    baseline_attention.py:148-194). captions [B,T] int -> scores [B,T,vocab].
    drop: train-time dropout inside the adaptive block (ops/dropout.py).
    """
    emb = params["embed"][captions]  # [B,T,E]
    x = jnp.concatenate([emb, jnp.broadcast_to(v_g[:, None, :], emb.shape)], axis=-1)
    hiddens, cells, _ = lstm_scan(params["lstm"], x, (h0, c0))
    scores, alpha, beta = adaptive_block_apply(
        params["adaptive"], spec, x, hiddens, cells, V, drop=drop
    )
    return mask_padded_vocab(spec, scores), alpha, beta


# ------------------------------------------------------------- single step
class DecodeState(NamedTuple):
    h: jnp.ndarray  # [B,H] LSTM hidden
    c: jnp.ndarray  # [B,H] LSTM cell
    # Sentinel's h_{t-1}: the previous step's LSTM *output*, zero at step 0 —
    # training shifts hiddens with a zero prefix (adaptive_attention.py:116-122),
    # NOT with the encoder-provided h0, so decode must start from zero too.
    h_prev: jnp.ndarray  # [B,H]


def decode_step(
    params: Dict, spec: DecoderSpec, token: jnp.ndarray, v_g: jnp.ndarray,
    state: DecodeState, V: jnp.ndarray, sentinel_uses_prev_hidden: bool = False,
    pv: Optional[jnp.ndarray] = None, use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, DecodeState]:
    """One decode step: token [B] -> (logits [B,vocab], alpha [B,K], beta [B,1], state').

    With sentinel_uses_prev_hidden=False the sentinel sees h_{t-1}=0, exactly
    like the reference's sampler, which calls the decoder with seq-len 1 so
    the AdaptiveBlock's shift always yields the zero h0
    (adaptive_attention.py:116-122 under sampler :197-207).

    use_pallas routes the adaptive variant's sentinel+attention block through
    the fused TPU kernel (ops/pallas/fused_step.py); the vocab head stays in
    XLA where it joins the MXU-batched matmul stream.
    """
    from adaptive_tpu.ops import inits as _inits

    emb = params["embed"][token]  # [B,E]
    x = jnp.concatenate([emb, v_g], axis=-1)  # [B,2E]

    if use_pallas and spec.variant == "adaptive_attention":
        h_new, c_new, c_hat, alpha1, beta1 = _fused_cell(
            params, x, state, sentinel_uses_prev_hidden, V, pv,
            real_k=spec.num_slots, interpret=interpret,
        )
        logits = mask_padded_vocab(spec, _inits.linear(params["adaptive"]["mlp"], c_hat + h_new))
        return logits, alpha1, beta1, DecodeState(h_new, c_new, h_new)

    h_new, (h, c) = lstm_cell(params["lstm"], x, (state.h, state.c))
    h_prev = state.h_prev if sentinel_uses_prev_hidden else jnp.zeros_like(h_new)

    scores, alpha, beta = adaptive_block_apply(
        params["adaptive"], spec, x[:, None, :], h_new[:, None, :], c[:, None, :],
        V, h_prev=h_prev[:, None, :], pv=pv,
    )
    if beta is None:
        beta = jnp.zeros((token.shape[0], 1, 1), scores.dtype)
    scores = mask_padded_vocab(spec, scores)
    return scores[:, 0, :], alpha[:, 0, :], beta[:, 0, :], DecodeState(h, c, h_new)


def _fused_cell(params, x, state, sentinel_uses_prev_hidden, V, pv, real_k=None,
                beam_w=1, interpret=False):
    """Fully fused decode cell: LSTM recurrence + sentinel + attention in one
    Pallas kernel (SURVEY §7 step 6); the input projection stays an XLA
    full-batch MXU matmul. real_k: the true slot count when V/pv arrive
    pre-padded to the kernel's 64-lane alignment (pad_decode_slots — the
    decode scans hoist that pad out of the loop). beam_w > 1: V/pv arrive
    UNTILED ([B,...] vs the [B*W,...] rows) and the kernel shares each
    image's slots across its W beam rows — one HBM stream instead of W."""
    from adaptive_tpu.ops.pallas import adaptive_decode_cell_fused

    block = params["adaptive"]
    hp = state.h_prev if sentinel_uses_prev_hidden else jnp.zeros_like(state.h)
    if pv is None:
        pv = V @ block["atten"]["affine_v"]["kernel"]
    return adaptive_decode_cell_fused(
        params["lstm"], block["atten"], block["sentinel"], x,
        state.h, state.c, hp, V, pv, real_k=real_k, beam_w=beam_w,
        interpret=interpret,
    )


_HEAD_NEG = -1e30  # == ops.pallas.fused_step.NEG (the kernels' -inf stand-in)


def prepare_greedy_head(params: Dict, spec: DecoderSpec):
    """Padded vocab head (kernel [H,Vp'], bias [Vp']) for the fused
    greedy/beam head kernels — hoist ONCE per decode, outside the scan
    (padding inside the scan would copy the 10.5 MB head every step).

    Every bias column past the REAL vocab (the model's vocab-padding params
    AND the kernel-alignment pad) is set to -1e30: those logits come out
    <= NEG without any index masking, so a column-sharded head (tensor
    parallelism) stays correct when each shard's kernel only knows local
    column indices. Adding any realizable logit magnitude to -1e30 is a
    no-op in fp32 (ulp ~1e21), so the masked single-device path is
    bit-identical to before."""
    w = params["adaptive"]["mlp"]["kernel"]
    b = params["adaptive"]["mlp"]["bias"]
    vp = w.shape[1]
    target = -(-vp // 128) * 128
    if target > 1280:
        target = -(-target // 1280) * 1280  # chunk width the kernel uses
    w_p = jnp.pad(w, ((0, 0), (0, target - vp)))
    b_p = jnp.pad(b, (0, target - vp))
    col = jnp.arange(target)
    b_p = jnp.where(col < spec.vocab_size, b_p, jnp.asarray(_HEAD_NEG, b_p.dtype))
    return w_p, b_p


def embed_lookup(table: jnp.ndarray, token: jnp.ndarray, tp_axis=None) -> jnp.ndarray:
    """Embedding row gather, tensor-parallel-aware.

    tp_axis: a shard_map mesh axis name when the call runs inside shard_map
    with `table` potentially row-sharded over that axis. Each shard
    contributes its in-range rows (zeros otherwise) and a psum assembles the
    exact row — ONE shard owns any given token, so the sum is bit-exact. A
    replicated table degenerates correctly: shard 0's range covers the whole
    vocab and every other shard's offset pushes all tokens out of range."""
    if tp_axis is None:
        return table[token]
    vloc = table.shape[0]
    off = jax.lax.axis_index(tp_axis).astype(jnp.int32) * vloc
    rel = token - off
    ok = (rel >= 0) & (rel < vloc)
    emb = jnp.where(ok[:, None], table[jnp.clip(rel, 0, vloc - 1)], 0)
    return jax.lax.psum(emb, tp_axis)


def _tp_merge_topk(topv, topi, k: int, tp_axis):
    """Merge per-shard top-k lists (GLOBAL indices) across tp_axis into the
    global top-k, ties -> lower vocab index — the same rule the fused head
    kernel uses chunk-to-chunk, so the merged list equals the single-device
    kernel's output bit-for-bit."""
    allv = jax.lax.all_gather(topv, tp_axis, axis=1, tiled=True)  # [B, S*k]
    alli = jax.lax.all_gather(topi, tp_axis, axis=1, tiled=True)
    big = jnp.asarray(2 ** 30, alli.dtype)
    vs, idxs = [], []
    for _ in range(k):
        v = jnp.max(allv, axis=1, keepdims=True)
        i = jnp.min(jnp.where(allv == v, alli, big), axis=1, keepdims=True)
        vs.append(v)
        idxs.append(i)
        allv = jnp.where(alli == i, jnp.asarray(_HEAD_NEG, allv.dtype), allv)
    return jnp.concatenate(vs, axis=1), jnp.concatenate(idxs, axis=1)


def greedy_decode_step(
    params: Dict, spec: DecoderSpec, token: jnp.ndarray, v_g: jnp.ndarray,
    state: DecodeState, V: jnp.ndarray, sentinel_uses_prev_hidden: bool = False,
    pv: Optional[jnp.ndarray] = None, head=None, use_pallas: bool = False,
    tp_axis=None, head_tp: bool = False, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, DecodeState]:
    """One GREEDY step: token [B] -> (next_token [B] i32, alpha, beta, state').

    With use_pallas + the adaptive variant, the vocab head matmul and the
    argmax run inside one Pallas kernel against the hoisted `head`
    (prepare_greedy_head) — the [B, ~10k] logits never touch HBM. Otherwise
    identical to argmax over decode_step's logits.

    tp_axis/head_tp: inside shard_map with the embed table (and, when
    head_tp, the head columns) sharded over the `tp_axis` mesh axis. The
    column-sharded head runs the top-k kernel (W=1) per shard — NEG bias
    padding replaces index masking, see prepare_greedy_head — and the
    (value, global index) pairs merge across shards with the kernel's own
    tie rule, so ids equal the single-device argmax bit-for-bit.
    """
    if use_pallas and spec.variant == "adaptive_attention" and head is not None:
        from adaptive_tpu.ops.pallas.fused_step import beam_head_topk, greedy_head_argmax

        emb = embed_lookup(params["embed"], token, tp_axis)
        x = jnp.concatenate([emb, v_g], axis=-1)
        h_new, c_new, c_hat, alpha1, beta1 = _fused_cell(
            params, x, state, sentinel_uses_prev_hidden, V, pv,
            real_k=spec.num_slots, interpret=interpret,
        )
        if head_tp:
            if tp_axis is None:
                raise ValueError("head_tp requires tp_axis (a shard_map axis)")
            vloc = head[0].shape[1]
            topv, topi, _ = beam_head_topk(
                head[0], head[1], c_hat, h_new, vloc, 1, interpret=interpret
            )
            off = jax.lax.axis_index(tp_axis).astype(jnp.int32) * vloc
            _, topi = _tp_merge_topk(topv, topi + off, 1, tp_axis)
            nxt = topi[:, 0]
        else:
            nxt = greedy_head_argmax(
                head[0], head[1], c_hat, h_new, spec.vocab_size,
                interpret=interpret,
            )
        return nxt, alpha1, beta1, DecodeState(h_new, c_new, h_new)

    logits, alpha, beta, st = decode_step(
        params, spec, token, v_g, state, V, sentinel_uses_prev_hidden,
        pv=pv, use_pallas=use_pallas, interpret=interpret,
    )
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), alpha, beta, st


def beam_decode_step(
    params: Dict, spec: DecoderSpec, token: jnp.ndarray, v_g: jnp.ndarray,
    state: DecodeState, V: jnp.ndarray, k: int,
    sentinel_uses_prev_hidden: bool = False, pv: Optional[jnp.ndarray] = None,
    head=None, use_pallas: bool = False, beam_w: int = 1,
    tp_axis=None, head_tp: bool = False, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, DecodeState]:
    """One BEAM step: token [B] -> (logp_top [B,k] f32 normalized log-probs,
    tok_top [B,k] i32, alpha, beta, state').

    Per-row top-k is exact for beam search: the global top-k over all
    beam*vocab candidates contains at most k continuations of any one source
    beam, so each row's k best cover every possible winner — the [B, W*Vc]
    flat top_k the naive formulation needs (and its full-logit
    materialization) is avoided. With use_pallas + the adaptive variant the
    vocab head matmul, the per-row top-k, and the log-softmax normalizer run
    inside one Pallas kernel against the hoisted `head` (prepare_greedy_head)
    — the [B, ~10k] logits never touch HBM (ops/pallas/fused_step.py::
    beam_head_topk). Tie order matches lax.top_k (lower token id first).

    beam_w > 1: V/pv arrive UNTILED with one row per image while token/state
    carry beam_w batch-major rows per image; the fused cell streams each
    image's slots once (beam-major layout). The fallback path tiles them.
    """
    if use_pallas and spec.variant == "adaptive_attention" and head is not None:
        from adaptive_tpu.ops.pallas.fused_step import beam_head_topk

        emb = embed_lookup(params["embed"], token, tp_axis)
        x = jnp.concatenate([emb, v_g], axis=-1)
        h_new, c_new, c_hat, alpha1, beta1 = _fused_cell(
            params, x, state, sentinel_uses_prev_hidden, V, pv,
            real_k=spec.num_slots, beam_w=beam_w, interpret=interpret,
        )
        if head_tp:
            # column-sharded head (TP inside shard_map): per-shard top-k in
            # global index space (NEG bias pad replaces the vocab mask), then
            # the kernel's own chunk-merge rule across shards — topv/topi
            # equal the single-device kernel bit-for-bit; the per-shard
            # logsumexp partials cover disjoint column ranges, so their
            # combine is the true global logsumexp (to fp rounding).
            if tp_axis is None:
                raise ValueError("head_tp requires tp_axis (a shard_map axis)")
            vloc = head[0].shape[1]
            topv, topi, lse_l = beam_head_topk(
                head[0], head[1], c_hat, h_new, vloc, k, interpret=interpret
            )
            off = jax.lax.axis_index(tp_axis).astype(jnp.int32) * vloc
            topv, topi = _tp_merge_topk(topv, topi + off, k, tp_axis)
            alls = jax.lax.all_gather(lse_l, tp_axis, axis=1, tiled=True)  # [B,S]
            m = jnp.max(alls, axis=1, keepdims=True)
            lse = jnp.log(jnp.sum(jnp.exp(alls - m), axis=1, keepdims=True)) + m
        else:
            topv, topi, lse = beam_head_topk(
                head[0], head[1], c_hat, h_new, spec.vocab_size, k,
                interpret=interpret,
            )
        return topv - lse, topi, alpha1, beta1, DecodeState(h_new, c_new, h_new)

    if beam_w > 1:  # dense fallback consumes per-row slots
        # beam-major callers may pre-pad slots for the fused cell
        # (pad_decode_slots) — decode_step has no padded-slot mask, so a
        # padded V here would silently softmax over zero slots
        if V.shape[1] != spec.num_slots:
            raise ValueError(
                f"beam_w={beam_w} fallback needs unpadded slots: V has "
                f"{V.shape[1]} slots, spec.num_slots={spec.num_slots}"
            )
        V = jnp.repeat(V, beam_w, axis=0)
        pv = None if pv is None else jnp.repeat(pv, beam_w, axis=0)
    logits, alpha, beta, st = decode_step(
        params, spec, token, v_g, state, V, sentinel_uses_prev_hidden,
        pv=pv, use_pallas=use_pallas, interpret=interpret,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(logp, k)
    return topv, topi.astype(jnp.int32), alpha, beta, st
