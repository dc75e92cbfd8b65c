"""Pallas TPU kernel: fused bottleneck tail + next-block conv1 (int8 carry).

One kernel computes, for a pair of adjacent identity bottleneck blocks
(i, i+1) on the int8-carry path —

    out_i  = requant(relu(conv3_i(z2_i) * sc3 + b3 + x_i * s_in), s_out)
    z1_next = requant(relu(conv1_{i+1}(out_i) * sc1 + b1), s_next)

— both 1x1 convolutions, i.e. pure row-wise matmuls: no spatial taps, no
shifts, no masks. The XLA carry path (models/infer.py::_resnet_int8_carry)
writes out_i (the [B*S, C] carry tensor, C the wide bottleneck dim) to HBM
in conv3's epilogue and immediately reads all of it back for the next
block's conv1. Fusing the pair keeps out_i VMEM-resident for the conv1
consumption, eliding one full carry read per block boundary — the carry is
the dominant inter-block tensor (e.g. ResNet-152 layer3 at batch 1024:
205 MB per boundary x 33 boundaries). out_i is still written once (block
i+1's conv3 needs it as the residual), so HBM traffic per boundary drops
from {read z2, read x, write out, read out, write z1} to {read z2, read x,
write out, write z1}.

This kernel exists because the whole-block fusion (ops/pallas/fused_block.py)
measured as a net loss: its 3x3-conv-as-9-shifted-matmuls formulation pays a
VPU tax (shift + edge-mask per tap) larger than the fusion's byte savings
(VALIDATION.md round-3 fused-block ladder). Here the 3x3 conv stays in XLA
— which runs it natively windowed at ~70% of int8 MXU peak — and Pallas
takes only the matmul-shaped pair where it measured FASTER than XLA (the
no-shift probe).

MEASURED NEGATIVE on-chip (VALIDATION.md round-3 fused-tail ladder): 7,134
vs 8,482 captions/s at batch 1024, layer3. The XLA carry path runs
conv2 -> epilogue -> conv3 as ONE fusion; inserting this custom-call splits
it, so conv2's raw accumulator materializes in HBM, its relu/requant becomes
a standalone full-tensor pass (33 ms/iter), and the flatten reshapes emit
real copies (~12 ms/iter) — several times the ~9 ms of carry reads saved.
Kept as a tested experiment (`bench.py --fused-tails layer3`); the XLA
carry stays the production default.

Math is op-for-op the XLA carry segment, so outputs match except for
one-ULP FMA-contraction differences at requant round-to-nearest ties
(+/-1 s8 quantum on rare elements; tests/test_pallas.py pins the bound).

Reference hot loop this accelerates: CNN feature extraction inside the
reference's sampler, baseline_attention.py:36-62.
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

_SUBLANE_I8 = 32  # int8 sublane tile; row-block sizes must align

# Rows per grid program. Any multiple of 32 tiles the flattened [B*S, .]
# activations (1x1 convs have no image structure to respect); 1024 keeps
# the f32/i32 intermediates (~5 MB/kernel at C=1024) well under the VMEM
# limit while leaving the pipeline enough programs to overlap DMA.
_BLOCK_ROWS = 1024


def _kernel(x_ref, z2_ref, w3_ref, sc3_ref, b3_ref, w1_ref, sc1_ref, b1_ref,
            s_ref, out_ref, z1_ref):
    f32 = jnp.float32
    s_in, s_out, s_next = (s_ref[0, i] for i in range(3))

    def requant(z, s):  # models/infer.py::_requant, op-for-op
        return jnp.clip(jnp.round(z / s), -127.0, 127.0).astype(jnp.int8)

    # conv3 1x1 + dequantized-s8 residual + relu + requant (carry epilogue)
    acc3 = jnp.dot(z2_ref[:], w3_ref[:], preferred_element_type=jnp.int32)
    tail = acc3.astype(f32) * sc3_ref[:] + b3_ref[:]
    out = requant(jax.nn.relu(tail + x_ref[:].astype(f32) * s_in), s_out)
    out_ref[:] = out

    # next block's conv1 1x1 + relu + requant, consuming the VMEM-resident
    # carry (bit-identical input to what the XLA path would read from HBM)
    acc1 = jnp.dot(out, w1_ref[:], preferred_element_type=jnp.int32)
    z1 = jax.nn.relu(acc1.astype(f32) * sc1_ref[:] + b1_ref[:])
    z1_ref[:] = requant(z1, s_next)


def tail_conv1_int8(
    x_s8: jnp.ndarray, z2_s8: jnp.ndarray,
    w3q: jnp.ndarray, sc3: jnp.ndarray, b3: jnp.ndarray,
    w1q: jnp.ndarray, sc1: jnp.ndarray, b1: jnp.ndarray,
    s_in: float, s_out: float, s_next: float,
    interpret: bool = False,
):
    """Fused conv3+residual+requant | conv1+relu+requant pair.

    x_s8 [N, C] the s8 carry input of block i (residual), z2_s8 [N, M] the
    s8 conv2 output of block i; w3q [M, C] s8, w1q [C, M2] s8; sc3/b3
    [1, C] and sc1/b1 [1, M2] f32 epilogue rows (scN = requant-scale x
    per-channel weight scale product as in the XLA path); s_in/s_out/s_next
    the static carry scales. N must be a multiple of 32.

    Returns (out_s8 [N, C], z1_next_s8 [N, M2]) — the block-i carry output
    and the block-i+1 conv1 activation, each equal to the XLA carry segment
    up to +/-1-quantum requant rounding ties (see module docstring).
    """
    N, C = x_s8.shape
    M = z2_s8.shape[1]
    M2 = w1q.shape[1]
    R = min(_BLOCK_ROWS, N)
    if N % R:
        R = _SUBLANE_I8  # N is 32-aligned by contract; fall back to min tile
    scal = jnp.array([[s_in, s_out, s_next]], jnp.float32)
    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    out, z1 = pl.pallas_call(
        _kernel,
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), rep, memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M2), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, C), jnp.int8),
            jax.ShapeDtypeStruct((N, M2), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_s8, z2_s8, w3q, sc3, b3, w1q, sc1, b1, scal)
    return out, z1
