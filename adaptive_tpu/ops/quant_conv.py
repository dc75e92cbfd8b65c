"""Experimental quantized conv BACKWARD for the CNN fine-tune phase.

VERDICT r2 #9 / NEXT r2 #4: the fine-tune train step is memory-bound on the
conv backward; the remaining lever is fewer bytes. This module keeps the
forward conv exact (bf16/fp32, bit-identical training when disabled) and
swaps the two backward contractions to int8 with dynamic per-tensor scales:

    dx = conv(g_q8, flip_hw(w_q8).swap_io)        [stride-1 only]
    dw = conv(x_q8, g_q8)   via ("CHWN","IHWO","HWNC") dimension numbers

Strided convs (the 4 stage-boundary convs) keep the exact backward — their
transpose needs dilated/asymmetric padding and they are <5% of the bytes.

Modes (set_conv_bwd_quant, a TRACE-TIME switch — call before jitting):
    'none'    exact jax autodiff backward (default; production path)
    'manual'  the hand-derived backward formulas in full precision —
              bit-compared against autodiff in tests (validates the math
              separately from the quantization noise)
    'int8'    the experiment: int8 backward contractions

Measured result goes in VALIDATION.md; this is an opt-in experiment
(bench.py --mode train --conv-bwd-quant int8), not a default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_MODE = {"mode": "none"}
_MODES = ("none", "manual", "int8")


def set_conv_bwd_quant(mode: str) -> None:
    if mode not in _MODES:
        raise ValueError(f"conv_bwd_quant={mode!r} — must be one of {_MODES}")
    _MODE["mode"] = mode


def get_conv_bwd_quant() -> str:
    return _MODE["mode"]


def conv_nhwc(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """NHWC/HWIO conv with torch-style symmetric (k-1)//2 padding.

    The single conv entry point for the resnet train path; dispatches the
    backward per the trace-time mode."""
    if _MODE["mode"] != "none" and stride == 1:
        return _conv_custom_bwd(_MODE["mode"] == "int8", x, kernel)
    return _plain(x, kernel, stride)


def _plain(x, kernel, stride=1):
    pad = (kernel.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _q8(t):
    """Dynamic symmetric per-tensor int8: (values s8, scale f32 scalar)."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_custom_bwd(use_int8: bool, x, kernel):
    return _plain(x, kernel, 1)


def _fwd(use_int8, x, kernel):
    return _plain(x, kernel, 1), (x, kernel)


def _bwd(use_int8, res, g):
    x, w = res
    pad = (w.shape[0] - 1) // 2
    pads = [(pad, pad)] * 2

    if use_int8:
        gq, sg = _q8(g)
        wq, sw = _q8(w)
        xq, sx = _q8(x)
        # dx[b,hi,wi,ci] = sum_{kh,kw,co} g[b,hi-kh+p,wi-kw+p,co] w[kh,kw,ci,co]
        w_t = jnp.flip(wq, (0, 1)).transpose(0, 1, 3, 2)  # [kh,kw,co,ci]
        dx = jax.lax.conv_general_dilated(
            gq, w_t, (1, 1), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sg * sw)
        # dw[kh,kw,ci,co] = sum_{b,ho,wo} x[b,ho+kh-p,wo+kw-p,ci] g[b,ho,wo,co]
        dw = jax.lax.conv_general_dilated(
            xq, gq, (1, 1), pads, dimension_numbers=("CHWN", "IHWO", "HWNC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sx * sg)
    else:  # 'manual': same contractions, full precision — formula validation
        gf = g.astype(jnp.float32)
        wf = w.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        w_t = jnp.flip(wf, (0, 1)).transpose(0, 1, 3, 2)
        dx = jax.lax.conv_general_dilated(
            gf, w_t, (1, 1), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        dw = jax.lax.conv_general_dilated(
            xf, gf, (1, 1), pads, dimension_numbers=("CHWN", "IHWO", "HWNC"),
        )
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv_custom_bwd.defvjp(_fwd, _bwd)
