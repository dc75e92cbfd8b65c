"""Pallas TPU kernel: fused sentinel + adaptive-attention decode step.

Fuses the per-token math of SURVEY.md §3.5 (minus LSTM cell and vocab head):

    s    = sigmoid(x Wx + h_prev Whs) * tanh(cell)        sentinel
    z    = wh . tanh(pv + h Wg)            (K slots)       spatial logits
    z_s  = wh . tanh(s Ws + h Wg)          (1 slot)        sentinel logit
    alpha = softmax_K(z);  c = alpha V
    beta = softmax_{K+1}([z; z_s])[-1]
    c_hat = beta s + (1-beta) c

One VMEM-resident kernel per batch block: no HBM round-trips for the
[B,K,D] `content` intermediate, both softmaxes computed in registers. The
K=49 slot axis is padded to 64 lanes with -inf masking; the D=49 projection
axis is padded to 64 with zero-padded `wh` rows so padded columns contribute
nothing. Equals the jnp path (ops/attention.py) to fp32 tolerance — verified
in tests/test_pallas.py via interpret mode.

The decode hot path runs adaptive_decode_cell_fused (this math PLUS the LSTM
recurrence) plus the fused vocab-head kernels (greedy_head_argmax /
beam_head_topk); training uses the autodiff'd jnp path. Reference math:
adaptive_attention.py:26-85.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Largest row block the fused cell has proven against the 16 MB scoped-VMEM
# budget on v5e (greedy Bb=64; beam widths 2-8 all land at <= 64 via the
# lcm(8, W) formula below). Widths whose lcm exceeds this (9, 11, 13, ...)
# would silently scale the block past the proven budget — refuse them loudly;
# beam.py routes such widths to the tiled (beam_w == 1) layout instead.
MAX_ROW_BLOCK = 64


def beam_major_supported(W: int) -> bool:
    """True if the beam-major (shared V/pv) cell layout supports width W:
    the row block must hold whole beam groups AND whole 8-row sublanes, so
    its minimum size is lcm(8, W) — past MAX_ROW_BLOCK the VMEM budget is
    unproven and the kernel refuses (see adaptive_decode_cell_fused)."""
    return W == 1 or (8 * W // math.gcd(8, W)) <= MAX_ROW_BLOCK


def _cell_kernel(K: int, H: int, W: int, gx_ref, h_ref, c_ref, x_ref, hp_ref,
                 pv_ref, V_ref, whh_ref, bhh_ref, wx_ref, whs_ref, wg_ref,
                 ws_ref, wh_ref, hnew_ref, cnew_ref, chat_ref, alpha_ref,
                 beta_ref):
    """LSTM cell + sentinel + adaptive attention in one VMEM-resident kernel
    (SURVEY.md §7 step 6 / hard part #1: the fused decode cell).

    The time-invariant input projection gates_x = x@W_ih + b_ih stays an XLA
    batched matmul outside (cuDNN-style split, ops/lstm.py); the recurrence
    h@W_hh, the gate nonlinearities, and the whole attention block run here —
    h_new/c_new/c_hat never round-trip HBM between those stages.

    W: beam-major V/pv sharing. With W > 1 the row block holds W consecutive
    beam rows per image (batch-major repeat layout, row r -> image r // W)
    while the pv/V blocks hold ONE copy per image (Bb // W rows) — the
    loop-invariant [B,K,H] V and [B,K,D] pv stream from HBM once per step
    instead of W times (motivation: the round-3 trace showed the tiled cell
    streaming 3 copies of the ~200 MB V/pv at beam-3 batch 1024; measured
    beam-major numbers in VALIDATION.md's round-4 table). W == 1 is the
    dense per-row layout (greedy).
    """
    f32 = jnp.float32
    h_in = h_ref[:].astype(f32)
    c_in = c_ref[:].astype(f32)

    # LSTM cell (torch gate order i,f,g,o; ops/lstm.py:_gates_step parity)
    gates = gx_ref[:].astype(f32) + jnp.dot(
        h_in, whh_ref[:].astype(f32), preferred_element_type=f32
    ) + bhh_ref[:].astype(f32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    cell = f * c_in + i * g
    h = o * jnp.tanh(cell)

    x = x_ref[:].astype(f32)
    hp = hp_ref[:].astype(f32)

    # sentinel gate (adaptive_attention.py:79-83)
    gate = jax.nn.sigmoid(
        jnp.dot(x, wx_ref[:].astype(f32), preferred_element_type=f32)
        + jnp.dot(hp, whs_ref[:].astype(f32), preferred_element_type=f32)
    )
    s = gate * jnp.tanh(cell)

    ph = jnp.dot(h, wg_ref[:].astype(f32), preferred_element_type=f32)
    wh = wh_ref[:].astype(f32)

    pv = pv_ref[:].astype(f32)  # [Bb//W, KP, DP]
    if W == 1:
        content = jnp.tanh(pv + ph[:, None, :])
        z = jnp.sum(content * wh[None, :, :], axis=-1)
    else:
        Bb = ph.shape[0]
        Bw, DP = Bb // W, ph.shape[1]
        ph3 = ph.reshape(Bw, W, DP)
        # per-beam pass over the SHARED pv block; [Bw,W,KP] -> row-major
        # [Bb,KP]. Static slices (index_in_dim), NOT ph3[:, w, None, :]:
        # integer-index + newaxis lowers to a 3D gather, which Mosaic
        # rejects ("Only 2D gather is supported" — caught on real v5e).
        z = jnp.stack(
            [
                jnp.sum(
                    jnp.tanh(pv + jax.lax.index_in_dim(ph3, w, 1, False)[:, None, :])
                    * wh[None, :, :],
                    axis=-1,
                )
                for w in range(W)
            ],
            axis=1,
        ).reshape(Bb, pv.shape[1])
    KP = z.shape[1]
    kmask = jax.lax.broadcasted_iota(jnp.int32, (1, KP), 1) < K
    z = jnp.where(kmask, z, NEG)

    content_s = jnp.tanh(
        jnp.dot(s, ws_ref[:].astype(f32), preferred_element_type=f32) + ph
    )
    z_s = jnp.sum(content_s * wh[0][None, :], axis=-1, keepdims=True)

    m = jnp.max(z, axis=-1, keepdims=True)
    e = jnp.where(kmask, jnp.exp(z - m), 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    alpha = e / denom

    m2 = jnp.maximum(m, z_s)
    denom2 = denom * jnp.exp(m - m2) + jnp.exp(z_s - m2)
    beta = jnp.exp(z_s - m2) / denom2

    Vb = V_ref[:].astype(f32)  # [Bb//W, KP, Hv]
    if W == 1:
        ctx = jnp.sum(alpha[:, :, None] * Vb, axis=1)
    else:
        alpha3 = alpha.reshape(Bw, W, KP)
        ctx = jnp.stack(
            [
                jnp.sum(
                    jax.lax.index_in_dim(alpha3, w, 1, False)[:, :, None] * Vb,
                    axis=1,
                )
                for w in range(W)
            ],
            axis=1,
        ).reshape(Bb, Vb.shape[-1])
    hnew_ref[:] = h.astype(hnew_ref.dtype)
    cnew_ref[:] = cell.astype(cnew_ref.dtype)
    chat_ref[:] = (beta * s + (1.0 - beta) * ctx).astype(chat_ref.dtype)
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)
    beta_ref[:] = beta.astype(beta_ref.dtype)


def padded_rows(R: int, beam_w: int = 1):
    """(BP, Bb): the fused cell's padded row count and row block for R rows
    at beam width beam_w. The row block must hold whole 8-row sublanes and
    (for beam_w > 1) whole beam groups."""
    if beam_w == 1:
        BP = _round_up(R, 8)
        Bb = min(MAX_ROW_BLOCK, BP)
        return _round_up(BP, Bb), Bb
    base = 8 * beam_w // math.gcd(8, beam_w)
    if base > MAX_ROW_BLOCK:
        raise ValueError(
            f"beam_w={beam_w} needs a {base}-row block — past the proven "
            f"{MAX_ROW_BLOCK}-row VMEM budget. Gate on "
            "beam_major_supported(W) and fall back to the tiled layout "
            "(beam_w=1 with V/pv repeated per beam)."
        )
    Bb = base * max(1, MAX_ROW_BLOCK // base)
    return _round_up(R, Bb), Bb


def pad_decode_slots(V: jnp.ndarray, pv: jnp.ndarray, beam_w: int = 1):
    """Pre-pad V/pv slot+projection axes to the kernel's 64-lane alignment —
    and the image axis to the cell's row block — ONCE, outside the decode
    scan. The fused cell pads internally, but XLA re-materializes in-loop
    pads (and the beam tile broadcast) of these loop-invariant operands
    EVERY step — measured 17 ms/iter (pad) + 12 ms/iter (tile) at beam
    batch 1024 on v5e; the batch-axis pad bites whenever B*beam_w isn't a
    multiple of the row block (e.g. serving's batch 32 at beam > 1). A
    zero-width pad is elided, so feeding pre-padded arrays makes the
    in-kernel pads no-ops; the optimization_barrier pins the materialized
    buffers outside the loop. Callers pass the REAL slot count to the cell
    via real_k (the padded V.shape[1] no longer carries it); the cell reads
    the real row count from x.shape[0]."""
    B, K, H = V.shape
    D = pv.shape[-1]
    KP, DP = _round_up(K, 64), _round_up(D, 64)
    BP, _ = padded_rows(B * beam_w, beam_w)
    BPb = BP // beam_w
    V_p = jnp.pad(V, ((0, BPb - B), (0, KP - K), (0, 0)))
    pv_p = jnp.pad(pv, ((0, BPb - B), (0, KP - K), (0, DP - D)))
    return jax.lax.optimization_barrier((V_p, pv_p))


def adaptive_decode_cell_fused(
    lstm: dict, atten: dict, sentinel: dict, x: jnp.ndarray,
    h_in: jnp.ndarray, c_in: jnp.ndarray, h_prev: jnp.ndarray,
    V: jnp.ndarray, pv: jnp.ndarray, real_k: int = None,
    beam_w: int = 1, interpret: bool = False,
):
    """Fused single-token decode cell: LSTM + sentinel + adaptive attention.

    x [R,2E], h_in/c_in/h_prev [R,H], V [B,K,H], pv [B,K,D] where
    R == B * beam_w. Returns (h_new [R,H], c_new [R,H], c_hat [R,H],
    alpha [R,real_k], beta [R,1]). real_k: the true slot count when V/pv
    arrive pre-padded (pad_decode_slots); defaults to V.shape[1].

    beam_w > 1: beam-major layout — rows are batch-major beam copies
    (row r belongs to image r // beam_w, i.e. jnp.repeat order) and V/pv are
    passed UNTILED so each image's slots stream from HBM once per step, not
    beam_w times. beam_w == 1 is the dense greedy layout (one image per row).
    Numerics: equals lstm_cell + the jnp attention path to fp32 tolerance
    (tests/test_pallas.py, interpret mode on CPU).
    """
    W = beam_w
    B, K_in, H = V.shape
    R = x.shape[0]
    BP, Bb = padded_rows(R, W)
    BPb = BP // W  # padded IMAGE rows for the shared V/pv operands
    # V/pv may arrive with the image axis pre-padded to the row block
    # (pad_decode_slots): accept either the real or the padded image count
    if B * W not in (R, BP):
        raise ValueError(
            f"V batch {B} * beam_w {W} must equal the row count {R} or its "
            f"row-block padding {BP} (pad_decode_slots) — beam-major rows "
            "must be batch-major beam copies (jnp.repeat layout)"
        )
    K = real_k or K_in
    D = pv.shape[-1]
    KP, DP = _round_up(K_in, 64), _round_up(D, 64)

    f32 = jnp.float32
    # input projection as one full-batch MXU matmul, outside the kernel
    gx = (x @ lstm["w_ih"] + lstm["b_ih"]).astype(f32)

    padB = lambda a: jnp.pad(a, ((0, BP - R),) + ((0, 0),) * (a.ndim - 1))
    gx_, h_, c_, x_, hp_ = (padB(t) for t in (gx, h_in, c_in, x, h_prev))
    V_ = jnp.pad(V, ((0, BPb - B), (0, KP - K_in), (0, 0)))
    pv_ = jnp.pad(pv, ((0, BPb - B), (0, KP - K_in), (0, DP - D)))

    whh = lstm["w_hh"]
    bhh = lstm["b_hh"][None, :]
    wx = sentinel["affine_x"]["kernel"]
    whs = sentinel["affine_h"]["kernel"]
    # pad the weights from their OWN projection dim (pv may arrive pre-padded
    # to DP already — pad_decode_slots — while the weights never are)
    Dw = atten["affine_g"]["kernel"].shape[1]
    wg = jnp.pad(atten["affine_g"]["kernel"], ((0, 0), (0, DP - Dw)))
    ws = jnp.pad(atten["affine_s"]["kernel"], ((0, 0), (0, DP - Dw)))
    wh = jnp.pad(atten["affine_h"]["kernel"][:, 0][None, :], ((0, 0), (0, DP - Dw)))

    E2 = x.shape[-1]
    grid = (BP // Bb,)
    row = lambda i: (i, 0)
    row3 = lambda i: (i, 0, 0)
    rep = lambda i: (0, 0)
    out_dtype = h_in.dtype

    outs = pl.pallas_call(
        functools.partial(_cell_kernel, K, H, W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, 4 * H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, E2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb // W, KP, DP), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb // W, KP, H), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((E2, H), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, DP), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, DP), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DP), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, KP), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, H), out_dtype),
            jax.ShapeDtypeStruct((BP, H), out_dtype),
            jax.ShapeDtypeStruct((BP, H), out_dtype),
            jax.ShapeDtypeStruct((BP, KP), f32),
            jax.ShapeDtypeStruct((BP, 1), f32),
        ],
        interpret=interpret,
    )(gx_, h_, c_, x_, hp_, pv_, V_, whh, bhh, wx, whs, wg, ws, wh)

    h_new, c_new, chat, alpha, beta = outs
    return h_new[:R], c_new[:R], chat[:R], alpha[:R, :K], beta[:R]


def _head_argmax_kernel(vocab_len: int, VC: int, chat_ref, h_ref, w_ref, b_ref, out_ref):
    """Vocab head + greedy argmax without materializing logits in HBM.

    The [B, ~10k] logits tensor (10.5 MB/step at batch 512) normally rides
    HBM twice per decode step (matmul write + argmax read). Here the head
    matmul runs in VC-wide chunks against the VMEM-resident weight block and
    only the winning token index leaves the kernel. First-max tie semantics
    match jnp.argmax.
    """
    f32 = jnp.float32
    z = (chat_ref[:] + h_ref[:]).astype(w_ref.dtype)  # bf16 add, like the jnp path
    Vp = w_ref.shape[1]
    rows = z.shape[0]
    best = jnp.full((rows, 1), NEG, f32)
    arg = jnp.zeros((rows, 1), jnp.int32)
    for j in range(Vp // VC):
        w_c = w_ref[:, j * VC:(j + 1) * VC]
        lg = jnp.dot(z, w_c, preferred_element_type=f32)
        lg = lg + b_ref[0, j * VC:(j + 1) * VC].astype(f32)[None, :]
        idx = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1) + j * VC
        lg = jnp.where(idx < vocab_len, lg, NEG)  # mask_padded_vocab parity
        cmax = jnp.max(lg, axis=1, keepdims=True)
        cidx = jnp.min(jnp.where(lg == cmax, idx, Vp), axis=1, keepdims=True)
        take = cmax > best  # strict: earlier chunk keeps first-max ties
        best = jnp.where(take, cmax, best)
        arg = jnp.where(take, cidx, arg)
    out_ref[:] = arg


def greedy_head_argmax(
    head_kernel: jnp.ndarray, head_bias: jnp.ndarray, chat: jnp.ndarray,
    h: jnp.ndarray, vocab_len: int, interpret: bool = False,
) -> jnp.ndarray:
    """argmax((chat+h) @ W + b) over the real vocab, fused. Returns [B] int32.

    head_kernel [H, Vp]/head_bias [Vp] should be hoisted + padded ONCE per
    decode (prepare_greedy_head in models/decoders.py) — not per step.
    """
    B, H = chat.shape
    Vp = head_kernel.shape[1]
    VC = min(1280, Vp)
    assert Vp % VC == 0, (Vp, VC)
    BP = _round_up(B, 8)
    Bb = min(256, BP)
    BP = _round_up(BP, Bb)
    padB = lambda a: jnp.pad(a, ((0, BP - B), (0, 0)))

    grid = (BP // Bb,)
    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_head_argmax_kernel, vocab_len, VC),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Vp), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, 1), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        interpret=interpret,
    )(padB(chat), padB(h), head_kernel, head_bias[None, :])
    return out[:B, 0]


def _head_topk_kernel(vocab_len: int, VC: int, W: int, chat_ref, h_ref,
                      w_ref, b_ref, topv_ref, topi_ref, lse_ref):
    """Vocab head + per-row top-W + streaming logsumexp, logits never in HBM.

    The beam-search analogue of _head_argmax_kernel: each beam row needs its
    W best continuations (values + token ids) and the row's log-softmax
    normalizer. Materializing the [B*W, ~10k] logits in HBM and running a
    W*Vc-wide lax.top_k dominated the beam scan (trace: 94 of 147 ms/iter at
    batch 1024, VALIDATION.md round 3); here the head matmul runs in VC-wide
    chunks against the VMEM-resident weight block and only 2W+1 numbers per
    row leave the kernel. Tie semantics match lax.top_k (equal values -> the
    lower vocab index ranks first).
    """
    f32 = jnp.float32
    z = (chat_ref[:] + h_ref[:]).astype(w_ref.dtype)  # bf16 add, like the jnp path
    Vp = w_ref.shape[1]
    rows = z.shape[0]
    bv = jnp.full((rows, W), NEG, f32)       # running top-W values, desc
    bi = jnp.full((rows, W), Vp, jnp.int32)  # running top-W vocab indices
    m0 = jnp.full((rows, 1), NEG, f32)       # streaming logsumexp max
    s0 = jnp.zeros((rows, 1), f32)           # streaming logsumexp sum
    for j in range(Vp // VC):
        w_c = w_ref[:, j * VC:(j + 1) * VC]
        lg = jnp.dot(z, w_c, preferred_element_type=f32)
        lg = lg + b_ref[0, j * VC:(j + 1) * VC].astype(f32)[None, :]
        idx = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1) + j * VC
        lg = jnp.where(idx < vocab_len, lg, NEG)  # mask_padded_vocab parity
        # streaming logsumexp over the real vocab (masked lanes: exp(NEG)=0)
        cm = jnp.max(lg, axis=1, keepdims=True)
        nm = jnp.maximum(m0, cm)
        s0 = s0 * jnp.exp(m0 - nm) + jnp.sum(jnp.exp(lg - nm), axis=1, keepdims=True)
        m0 = nm
        # chunk top-W by W mask-max passes (ties -> lowest index, like top_k)
        cvs, cis = [], []
        for _ in range(W):
            v = jnp.max(lg, axis=1, keepdims=True)
            i = jnp.min(jnp.where(lg == v, idx, Vp), axis=1, keepdims=True)
            cvs.append(v)
            cis.append(i)
            lg = jnp.where(idx == i, NEG, lg)
        # merge running and chunk lists (disjoint index ranges -> no dup ids)
        conc_v = jnp.concatenate([bv] + cvs, axis=1)  # [rows, 2W]
        conc_i = jnp.concatenate([bi] + cis, axis=1)
        nvs, nis = [], []
        for _ in range(W):
            v = jnp.max(conc_v, axis=1, keepdims=True)
            i = jnp.min(jnp.where(conc_v == v, conc_i, Vp), axis=1, keepdims=True)
            nvs.append(v)
            nis.append(i)
            conc_v = jnp.where(conc_i == i, NEG, conc_v)
        bv = jnp.concatenate(nvs, axis=1)
        bi = jnp.concatenate(nis, axis=1)
    topv_ref[:] = bv
    topi_ref[:] = bi
    lse_ref[:] = jnp.log(s0) + m0


def beam_head_topk(
    head_kernel: jnp.ndarray, head_bias: jnp.ndarray, chat: jnp.ndarray,
    h: jnp.ndarray, vocab_len: int, W: int, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """top-W of (chat+h) @ W + b over the real vocab, plus the log-softmax
    normalizer, fused. Returns (topv [B,W] f32, topi [B,W] i32, lse [B,1] f32)
    so topv - lse is the rows' top-W normalized log-probs.

    head_kernel [H, Vp]/head_bias [Vp]: hoisted + zero-padded ONCE per decode
    (prepare_greedy_head in models/decoders.py) — not per step.
    """
    B, H = chat.shape
    Vp = head_kernel.shape[1]
    VC = min(1280, Vp)
    assert Vp % VC == 0, (Vp, VC)
    BP = _round_up(B, 8)
    # Bb 128 (vs the greedy argmax kernel's 256): the top-W working set
    # (chunk lg + 2W merge lists) on top of the resident 10.5 MB head block
    # overflows the 16 MB scoped-vmem budget at Bb=256 for W=5 (measured:
    # "Scoped allocation with size 16.64M" compile OOM at batch 256, W=5).
    # The head block's DMA is unaffected — its index map is constant, so it
    # stays resident across grid steps regardless of Bb.
    Bb = min(128, BP)
    BP = _round_up(BP, Bb)
    padB = lambda a: jnp.pad(a, ((0, BP - B), (0, 0)))

    grid = (BP // Bb,)
    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    topv, topi, lse = pl.pallas_call(
        functools.partial(_head_topk_kernel, vocab_len, VC, W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Vp), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bb, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, W), jnp.float32),
            jax.ShapeDtypeStruct((BP, W), jnp.int32),
            jax.ShapeDtypeStruct((BP, 1), jnp.float32),
        ],
        interpret=interpret,
    )(padB(chat), padB(h), head_kernel, head_bias[None, :])
    return topv[:B], topi[:B], lse[:B]
