"""Pallas TPU kernel: fused int8 bottleneck residual block (identity form).

One kernel computes a whole ResNet bottleneck identity block —

    z1 = requant(relu(conv1x1(x) * sc1 + b1), s2)
    z2 = requant(relu(conv3x3(z1) * sc2 + b2), s3)
    out = requant(relu(conv1x1(z2) * sc3 + b3 + x * s_in), s_out)

— with every intermediate resident in VMEM. The XLA int8-carry path
(models/infer.py::_resnet_int8_carry) runs the same math as three separate
convolutions whose s8 intermediates round-trip HBM; for the bandwidth-bound
layers (layer1 tails measured at the 925 MB/op HBM roofline, VALIDATION.md)
that traffic is the cost. Fusing the block leaves only the block input read
and output write: 3.3 GB -> 1.6 GB per layer1 block at batch 1024.

Mapping: activations are viewed as [B*S, C] (S = H*W spatial positions per
image); the grid walks groups of G images per program, G chosen so the block
row count G*S is int8-sublane aligned (multiple of 32). The 3x3 conv runs as
nine shifted matmuls on the flattened spatial axis: a roll by oy*W + ox
aligns each tap, and row/col masks (computed from a broadcasted iota) zero
positions whose tap would cross an image edge — which is exactly where a
roll also crosses an image or group boundary, so zero-padding semantics and
group packing are enforced by the same mask. int32 tap accumulation is
order-exact and the f32 epilogues replicate the XLA carry path op-for-op;
outputs match the XLA segment except for one-ULP FMA-contraction
differences at requant round-to-nearest ties (+/-1 s8 quantum; measured
1/131072 elements on real weights — tests/test_pallas.py pins the bound,
the int8 quality gates bound the end-to-end effect).

Weight quantization (per-out-channel symmetric, models/infer.py::_quant_w)
happens in the caller; this module only consumes s8 weights + fused scales.
Reference hot loop this accelerates: baseline_attention.py:36-62 (CNN
feature extraction inside the reference's sampler).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_SUBLANE_I8 = 32  # int8 min sublane tile; block row counts must align


def pick_group(batch: int, spatial: int) -> int:
    """Images per program: smallest G with G*spatial sublane-aligned and
    G | batch (so the grid tiles exactly). 0 = no valid grouping (caller
    falls back to the XLA path)."""
    g = 1
    while g <= batch:
        if batch % g == 0 and (g * spatial) % _SUBLANE_I8 == 0:
            return g
        g += 1
    return 0


def _pad_rows(W: int) -> int:
    """Scratch top/bottom padding: >= the largest tap offset (W+1), rounded
    up to the s8 sublane tile so the center write stays aligned."""
    return -(-(W + 1) // _SUBLANE_I8) * _SUBLANE_I8


def _kernel(W: int, GS: int, x_ref, w1_ref, w2_ref, w3_ref,
            sc1_ref, b1_ref, sc2_ref, b2_ref, sc3_ref, b3_ref,
            s_ref, out_ref, pad_ref):
    f32 = jnp.float32
    s2, s3, s_in, s_out = (s_ref[0, i] for i in range(4))
    x = x_ref[:]  # [GS, C] s8

    def requant(z, s):  # models/infer.py::_requant, op-for-op
        return jnp.clip(jnp.round(z / s), -127.0, 127.0).astype(jnp.int8)

    # conv1 1x1 == row-wise matmul
    acc1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.int32)
    z1f = jax.nn.relu(acc1.astype(f32) * sc1_ref[:] + b1_ref[:])

    # conv2 3x3: nine shifted matmuls over the flattened spatial axis.
    # shifted[p] = z1[p + oy*W + ox]; masks zero taps that cross an image
    # edge (identically: positions where the shift crossed a row, an image,
    # or the group block — SAME zero-padding in all three readings).
    # Tap generation: z1 is requantized ONCE to s8 and written to a zero-
    # padded VMEM scratch; each tap is then a statically-offset row slice of
    # the scratch. The earlier per-tap f32 pltpu.roll formulation cost more
    # VPU time than the whole fusion saved (7,285 vs 8,482 captions/s
    # layer3-fused; a no-shift probe measured 8,727 — see VALIDATION.md).
    PAD = _pad_rows(W)
    M = w2_ref.shape[-1]
    z1q = requant(z1f, s2)
    pad_ref[pl.ds(0, PAD), :] = jnp.zeros((PAD, M), jnp.int8)
    pad_ref[pl.ds(PAD + GS, PAD), :] = jnp.zeros((PAD, M), jnp.int8)
    pad_ref[pl.ds(PAD, GS), :] = z1q

    # Edge masks apply to the int32 DOT OUTPUT, not the s8 tap: a row's tap
    # contribution touches only that output row, so zeroing dot(tap)[p] ==
    # zeroing tap[p]. On the i32 accumulator the mask is a native 32-bit
    # bitwise AND with a 0/-1 row vector — no pack/unpack (a jnp.where on
    # the packed s8 tap cost ~25 ms/iter on layer3, the whole fusion win;
    # s8 multiply doesn't legalize; s8 AND needs an i1->s8 relayout Mosaic
    # rejects; bitcast-to-i32 AND pays two relayout shuffles per tap).
    idx = jax.lax.broadcasted_iota(jnp.int32, (GS, 1), 0)
    col = idx % W
    row = (idx // W) % W
    acc2 = jnp.zeros((GS, M), jnp.int32)
    for k, (oy, ox) in enumerate(
        (oy, ox) for oy in (-1, 0, 1) for ox in (-1, 0, 1)
    ):
        o = oy * W + ox
        tap = z1q if o == 0 else pad_ref[pl.ds(PAD + o, GS), :]
        d = jnp.dot(tap, w2_ref[k], preferred_element_type=jnp.int32)
        if oy or ox:
            valid = None
            if oy:
                valid = (row + oy >= 0) & (row + oy < W)
            if ox:
                vx = (col + ox >= 0) & (col + ox < W)
                valid = valid & vx if valid is not None else vx
            d = d & jnp.where(valid, jnp.int32(-1), jnp.int32(0))
        acc2 = acc2 + d
    z2 = requant(jax.nn.relu(acc2.astype(f32) * sc2_ref[:] + b2_ref[:]), s3)

    # conv3 1x1 + dequantized-s8 residual + relu + requant for the next block
    acc3 = jnp.dot(z2, w3_ref[:], preferred_element_type=jnp.int32)
    tail = acc3.astype(f32) * sc3_ref[:] + b3_ref[:]
    out = jax.nn.relu(tail + x.astype(f32) * s_in)
    out_ref[:] = requant(out, s_out)


def bottleneck_identity_int8(
    x_s8: jnp.ndarray, W: int,
    w1q: jnp.ndarray, w2q: jnp.ndarray, w3q: jnp.ndarray,
    sc1: jnp.ndarray, b1: jnp.ndarray, sc2: jnp.ndarray, b2: jnp.ndarray,
    sc3: jnp.ndarray, b3: jnp.ndarray,
    s2: float, s3: float, s_in: float, s_out: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused identity bottleneck block on s8 carry activations.

    x_s8 [B, S, C] (S = W*W), w1q [C, M] s8, w2q [9, M, M] s8 (tap order
    ky*3+kx), w3q [M, C] s8; sc*/b* f32 per-channel epilogue scale/bias rows
    ([1, M] or [1, C]); s2/s3/s_in/s_out the static requant scalars.
    Returns [B, S, C] s8 — equals the XLA carry segment up to +/-1-quantum
    requant rounding ties (see module docstring).
    """
    B, S, C = x_s8.shape
    M = w1q.shape[1]
    G = pick_group(B, S)
    if not G:
        raise ValueError(f"no sublane-aligned image grouping for B={B}, S={S}")
    GS = G * S

    scal = jnp.array([[s2, s3, s_in, s_out]], jnp.float32)
    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, W, GS),
        grid=(B * S // GS,),
        in_specs=[
            pl.BlockSpec((GS, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, M, M), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), rep, memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((GS, C), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * S, C), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2 * _pad_rows(W) + GS, M), jnp.int8)],
        # layer1 geometry (GS=3136, C=256) needs ~20 MB of scoped VMEM for
        # the f32 epilogue intermediates — above the 16 MB default limit,
        # comfortably inside v5e's 128 MB.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_s8.reshape(B * S, C), w1q, w2q, w3q, sc1, b1, sc2, b2, sc3, b3, scal)
    return out.reshape(B, S, C)
