"""Inference-path optimizations: BN folding + compute-dtype weight casting.

Eval-mode BatchNorm is an affine map with constants, so it folds into the
preceding conv: kernel' = kernel * scale/sqrt(var+eps) (per out-channel),
bias' = bias_bn - mean * scale/sqrt(var+eps). Folding happens *inside* the
decode jit (params are traced, cost is one elementwise pass over the weights,
~0.5 ms for ResNet-152) and removes every BN op + fp32 normalization pass
from the encoder — identical math to eval-mode BN (models/resnet.py:_bn with
train=False), so outputs match the unfolded path to float tolerance.

cast_floating() moves float32 weights to the compute dtype (bfloat16 on TPU)
so the decode scan streams the ~5M-param vocab head from HBM at half width —
measured 7x faster for the 30-step decode loop on v5e.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_tpu.models import resnet as R


def cast_floating(tree: Any, dtype) -> Any:
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def _fold(conv: Dict, bn_p: Dict, bn_s: Dict) -> Dict:
    inv = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + R.BN_EPS)
    return {
        "kernel": conv["kernel"] * inv[None, None, None, :],
        "bias": bn_p["bias"] - bn_s["mean"] * inv,
    }


def fold_resnet(params: Dict, state: Dict, arch: str) -> Dict:
    """Fold all BNs of a resnet param/state tree into conv kernel+bias."""
    block_type, stages = R.RESNET_SPECS[arch]
    n_convs = 3 if block_type == "bottleneck" else 2
    out: Dict[str, Any] = {"conv1": _fold(params["conv1"], params["bn1"], state["bn1"])}
    for li, n_blocks in enumerate(stages):
        blocks = []
        for bi in range(n_blocks):
            p, s = params[f"layer{li+1}"][bi], state[f"layer{li+1}"][bi]
            fp: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                fp[f"conv{ci}"] = _fold(p[f"conv{ci}"], p[f"bn{ci}"], s[f"bn{ci}"])
            if "downsample" in p:
                fp["downsample"] = _fold(p["downsample"]["conv"], p["downsample"]["bn"], s["downsample_bn"])
            blocks.append(fp)
        out[f"layer{li+1}"] = blocks
    return out


def _conv_b(x, p, stride=1):
    pad = (p["kernel"].shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _folded_forward(folded: Dict, x: jnp.ndarray, arch: str, conv_fn) -> jnp.ndarray:
    """Single traversal shared by the fp, int8, and calibration forwards.

    conv_fn(name, x, params, stride, pad) -> conv output (pre-activation).
    Names follow torchvision ('conv1', 'layerL.B.convN', 'layerL.B.downsample').
    """
    block_type, stages = R.RESNET_SPECS[arch]
    y = jax.nn.relu(conv_fn("conv1", x, folded["conv1"], 2, [(3, 3), (3, 3)]))
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            p = folded[f"layer{li+1}"][bi]
            nm = f"layer{li+1}.{bi}"
            stride = 2 if (li > 0 and bi == 0) else 1
            if block_type == "bottleneck":
                z = jax.nn.relu(conv_fn(f"{nm}.conv1", y, p["conv1"], 1, None))
                z = jax.nn.relu(conv_fn(f"{nm}.conv2", z, p["conv2"], stride, None))
                z = conv_fn(f"{nm}.conv3", z, p["conv3"], 1, None)
            else:
                z = jax.nn.relu(conv_fn(f"{nm}.conv1", y, p["conv1"], stride, None))
                z = conv_fn(f"{nm}.conv2", z, p["conv2"], 1, None)
            sc = (
                conv_fn(f"{nm}.downsample", y, p["downsample"], stride, None)
                if "downsample" in p
                else y
            )
            y = jax.nn.relu(z + sc)
    return y


def _plain_conv(name, x, p, stride, pad):
    if pad is not None:
        k = p["kernel"]
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(x.dtype)
    return _conv_b(x, p, stride)


def resnet_apply_folded(folded: Dict, x: jnp.ndarray, arch: str) -> jnp.ndarray:
    """BN-free inference forward; equals resnet_apply(train=False)."""
    return _folded_forward(folded, x, arch, _plain_conv)


# ------------------------------------------------------------- int8 path
# Symmetric PTQ: per-output-channel int8 weights, per-tensor int8 activations.
# v5e's int8 MXU runs ~1.4x bf16 for the compute-bound mid layers. With static
# calibrated activation scales the quantize is pure elementwise (fuses into
# the previous epilogue): measured 6457 vs 5519 captions/s e2e. Dynamic
# per-batch scales cost a full-tensor max reduce per conv and are a net LOSS
# (4265 captions/s) -- kept only as the zero-calibration fallback. int32
# accumulation, fp32 rescale + bias between convs. Opt-in serving mode
# (encoder_quant='int8'); validate quality on real data before production.
#
# int8 residual carry (round 3): the r2 trace showed the three bottleneck-
# tail fusions (conv3 + residual add + relu + requantize) at 700-880 GB/s —
# the HBM roofline — with the bf16 residual stream as the dominant bytes
# (e.g. layer3 conv3: 540 MB/op of which 411 MB is the bf16 residual read +
# write). With static scales the inter-block activation can live as s8+scale:
# conv1/downsample read s8 directly (their quantize op and its bf16 read
# disappear) and conv3's epilogue dequantizes the s8 residual, adds, relus,
# and requantizes for the next block — halving the dominant traffic. XLA
# fuses every elementwise step into the conv epilogues; no Pallas needed.

def _quant_w(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8: returns (w_i8 HWIO, scale [cout])."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w = jnp.clip(jnp.round(kernel / scale[None, None, None, :]), -127, 127)
    return w.astype(jnp.int8), scale


def _quant_x(x: jnp.ndarray, scale=None):
    """Per-tensor symmetric int8. With a static (calibrated) scale the
    quantize is pure elementwise and fuses into the previous op's epilogue;
    otherwise the scale is computed dynamically (extra full-tensor reduce)."""
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def _conv_i8(x, p, stride=1, out_dtype=jnp.bfloat16, x_scale=None, pad=None):
    xq, sx = _quant_x(x, x_scale)
    wq, sw = _quant_w(p["kernel"].astype(jnp.float32))
    if pad is None:
        k = p["kernel"].shape[0]
        pad = [((k - 1) // 2, (k - 1) // 2)] * 2
    acc = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)[None, None, None, :] + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def resnet_apply_folded_int8(
    folded: Dict, x: jnp.ndarray, arch: str, scales: Optional[Dict] = None,
    fused_layers=(), fused_tails=(), interpret: bool = False,
    stem_s2d: bool = False, bias_corr: Optional[Dict] = None,
) -> jnp.ndarray:
    """BN-folded int8-conv inference forward.

    scales: optional {conv_name: float} calibrated per-conv input scales
    (see calibrate_int8); validated to cover every conv of `arch` so a stale
    or mismatched calibration fails loudly instead of silently falling back
    to the slow dynamic path. scales=None -> fully dynamic.

    With static scales the fast int8-residual-carry traversal runs (see
    module comment); dynamic falls back to the per-conv quantize path.
    fused_layers routes those layers' identity blocks through the fused
    Pallas block kernel (bit-identical, ops/pallas/fused_block.py);
    fused_tails routes those layers' block BOUNDARIES through the fused
    conv3+residual|next-conv1 kernel (ops/pallas/fused_tail.py). The two
    target the same convs from different shapes — overlap is rejected.
    """
    overlap = set(fused_tails or ()) & set(fused_layers or ())
    if overlap:
        raise ValueError(
            f"layers {sorted(overlap)} appear in both fused_layers and "
            "fused_tails; each layer may use at most one fusion scheme"
        )
    if (fused_layers or fused_tails) and any(
        getattr(s, "ndim", 0) >= 1 for s in (scales or {}).values()
    ):
        raise ValueError(
            "per-channel int8 scales (encoder_quant_granularity='channel') are "
            "not supported by the fused Pallas block/tail kernels (they take "
            "scalar carry scales); use granularity='tensor' or fused_*=()"
        )
    if (fused_layers or fused_tails) and "wq" in folded.get("conv1", {}):
        raise ValueError(
            "the fused Pallas block/tail kernels quantize from raw folded "
            "kernels; pass the unprepared tree (skip prepare_encoder_inference)"
        )
    if (fused_layers or fused_tails) and bias_corr:
        raise ValueError(
            "int8 bias correction is not applied inside the fused Pallas "
            "block/tail kernels; use encoder_quant_bias_correct=False with "
            "fused layers/tails"
        )
    if scales is not None:
        return _resnet_int8_carry(folded, x, arch, scales, fused_layers,
                                  fused_tails, interpret, stem_s2d,
                                  bias_corr=bias_corr)
    if fused_layers or fused_tails:
        # the dynamic (uncalibrated) path never reads the fusion knobs — an
        # accepted-but-ignored flag would silently benchmark the wrong path
        # (same fail-loud rule as factory.py's unsupported-knob guards)
        raise ValueError(
            "int8_fused_layers/int8_fused_tails require calibrated static "
            "scales (int8_scales) — the dynamic per-conv path has no fused "
            "Pallas kernels; calibrate first or pass fused_*=()"
        )
    dt = x.dtype

    def conv(name, xx, p, stride, pad):
        return _conv_i8(xx, p, stride, dt, None, pad)

    return _folded_forward(folded, x, arch, conv)


def _quant_conv_weight(kernel, x_scale):
    """(int8 HWIO weight, fp32 [cout] scale for the s32 accumulator).

    x_scale may be a per-input-channel vector [Cin] (encoder_quant_granularity
    ='channel'): sum_c (x_q[c]*sx[c])*w[c] == sum_c x_q[c]*(w*sx)[c], so the
    activation scale folds into the fp32 kernel BEFORE weight quantization —
    per-channel activation resolution at zero runtime cost (the fold is an
    elementwise pass over the weights; the conv itself is unchanged)."""
    kernel = kernel.astype(jnp.float32)
    if getattr(x_scale, "ndim", 0) >= 1:
        kernel = kernel * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1)
        x_scale = 1.0
    wq, sw = _quant_w(kernel)
    return wq, sw * x_scale


def _acc_i8(x_s8, p, x_scale, stride=1, pad=None):
    """int8 conv from a folded conv dict: (int32 accumulator, fp32 [cout]
    scale). p carries either a raw fp32 'kernel' (quantized here, inside the
    per-batch program) or a prepared {'wq','scale'} pair from
    prepare_encoder_inference (quantized once, offline — the decode program
    then skips every weight pass). A bare kernel array is also accepted
    (reference path of the fused-kernel parity tests)."""
    if not isinstance(p, dict):
        p = {"kernel": p}
    if "wq" in p:
        wq, sc = p["wq"], p["scale"]
    else:
        wq, sc = _quant_conv_weight(p["kernel"], x_scale)
    if pad is None:
        k = wq.shape[0]
        pad = [((k - 1) // 2, (k - 1) // 2)] * 2
    acc = jax.lax.conv_general_dilated(
        x_s8, wq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc, sc


def _requant(y_f32, scale):
    """fp32 -> s8 with a static scale (pure elementwise; fuses upstream)."""
    return jnp.clip(jnp.round(y_f32 / scale), -127, 127).astype(jnp.int8)


# ------------------------------------------------- space-to-depth stem
# The 7x7/s2 conv1 reads 3 input channels — 3 of the MXU's 128 lanes. The
# classic TPU transform re-expresses it exactly: pack 2x2 pixel blocks into
# channels (224,224,3 -> 112,112,12) and run a 4x4/s1 conv whose kernel is
# the 7x7 kernel's taps scattered into 4x4x12 (15 zero taps). Output(i,j) =
# sum_{u,v} x[2i+u-3, 2j+v-3] w[u,v]; with u = 2a+r-1 (a in 0..3, r in 0..1)
# the receptive field spans exactly 4 s2d rows/cols with padding (2,1).
# BIT-EXACT on the int8 path: the integer products are the same set (zero
# taps contribute 0 to the s32 accumulator), and _quant_w's per-out-channel
# max|w| is unchanged by added zeros, so the quantized taps are identical
# (tests/test_int8.py::test_stem_s2d_bit_exact).


def _s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel order (row, col, C) row-major."""
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H // 2, W // 2, 4 * C)


def _stem_s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[7,7,Cin,Cout] -> [4,4,4*Cin,Cout]: w'[a,b,(r,q,ch)] = w[2a+r-1, 2b+q-1, ch]
    (front-padding one zero row/col realizes the u=-1 / v=-1 taps)."""
    K, _, Cin, Cout = kernel.shape
    assert K == 7, K
    wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    wp = wp.reshape(4, 2, 4, 2, Cin, Cout).transpose(0, 2, 1, 3, 4, 5)
    return wp.reshape(4, 4, 4 * Cin, Cout)


def _stem_s2d_conv(p: Dict, s0):
    """(conv dict with the s2d-rewritten 4x4 kernel, matching input scale).

    _s2d packs channels (row, col, C) row-major, so a per-channel image scale
    tiles 4x; zero taps stay zero under the scale fold, so the rewrite stays
    bit-exact vs the 7x7 path in either granularity. The ONE owner of this
    pairing — shared by the inline carry forward and
    prepare_encoder_inference so the two paths cannot drift
    (tests/test_infer.py::test_prepared_encoder_matches_inline)."""
    s0k = (jnp.tile(jnp.asarray(s0, jnp.float32), 4)
           if getattr(s0, "ndim", 0) >= 1 else s0)
    return {**p, "kernel": _stem_s2d_kernel(p["kernel"])}, s0k


# MEASURED NEGATIVE (round 3, VALIDATION.md): zero-point-128 asymmetric
# quantization of the post-relu carry tensors (full 8-bit range instead of
# symmetric's 7 effective bits) improved the trained-model CIDEr delta only
# -0.077 -> -0.062, and every formulation of the zero-point correction
# (constant, explicit -128 pad, batch-1 ones-conv map) broke XLA's
# conv+epilogue fusion — the accumulator spilled to HBM as s32 and
# throughput fell 8,504 -> ~5,930 captions/s. Symmetric carry is the shipped
# path; the quality spread is noise-level on the gate while the perf cost is
# 43%.


def _fused_identity_block(p: Dict, y_s8: jnp.ndarray, s_in: float, s2: float,
                          s3: float, s_out: float, interpret: bool = False) -> jnp.ndarray:
    """One identity bottleneck block through the fused Pallas kernel
    (ops/pallas/fused_block.py): same math as the XLA carry segment (up to
    +/-1-quantum requant rounding ties) with all intermediates
    VMEM-resident. Caller guarantees stride 1, no downsample, and a
    next-block scale (not the final block)."""
    from adaptive_tpu.ops.pallas import fused_block as FB

    B, H, W, C = y_s8.shape
    M = p["conv1"]["kernel"].shape[-1]
    w1q, sw1 = _quant_w(p["conv1"]["kernel"].astype(jnp.float32))
    w2q, sw2 = _quant_w(p["conv2"]["kernel"].astype(jnp.float32))
    w3q, sw3 = _quant_w(p["conv3"]["kernel"].astype(jnp.float32))
    out = FB.bottleneck_identity_int8(
        y_s8.reshape(B, H * W, C), W,
        w1q.reshape(C, M), w2q.reshape(9, M, M), w3q.reshape(M, C),
        (s_in * sw1)[None, :], p["conv1"]["bias"].astype(jnp.float32)[None, :],
        (s2 * sw2)[None, :], p["conv2"]["bias"].astype(jnp.float32)[None, :],
        (s3 * sw3)[None, :], p["conv3"]["bias"].astype(jnp.float32)[None, :],
        s2, s3, s_in, s_out, interpret=interpret,
    )
    return out.reshape(B, H, W, C)


def _block_fusable(p: Dict, y_s8: jnp.ndarray, stride: int, last: bool,
                   fused_layers, layer_name: str) -> bool:
    from adaptive_tpu.ops.pallas import fused_block as FB

    if layer_name not in (fused_layers or ()):
        return False
    if stride != 1 or last or "downsample" in p or "conv3" not in p:
        return False
    B, H, W, _ = y_s8.shape
    return H == W and FB.pick_group(B, H * W) > 0


def _tail_fusable(p: Dict, y_s8: jnp.ndarray, stride: int, last: bool,
                  fused_tails, layer_name: str) -> bool:
    """Boundary (i, i+1) is tail-fusable when block i is an identity
    bottleneck (the kernel's residual is the plain x*s_in dequant) and the
    flattened row count tiles the s8 sublane. Block i+1 needs no checks:
    a bottleneck conv1 is always 1x1 stride-1 (the stride lives on conv2),
    so its fused computation is valid even into a downsample block."""
    if layer_name not in (fused_tails or ()):
        return False
    if stride != 1 or last or "downsample" in p or "conv3" not in p:
        return False
    B, H, W, _ = y_s8.shape
    return (B * H * W) % 32 == 0


def _fused_tail_pair(p: Dict, next_p: Dict, y_s8_in: jnp.ndarray,
                     z2f: jnp.ndarray, s3: float, s_in: float, s_out: float,
                     s_next: float, interpret: bool = False):
    """Block-i tail (conv3 + s8-residual + relu + requant) fused with block-
    (i+1) conv1 (+ relu + requant) in one Pallas kernel — the carry tensor
    never round-trips HBM between them (ops/pallas/fused_tail.py). Same math
    as the XLA segment up to +/-1-quantum requant rounding ties.

    y_s8_in: block-i input carry [B,H,W,C]; z2f: block-i conv2 relu output
    (f32). Returns (carry_s8 [B,H,W,C], z1_next_s8 [B,H,W,M2]) where
    z1_next is block i+1's requantized conv1 activation (scale s_next)."""
    from adaptive_tpu.ops.pallas import fused_tail as FT

    B, H, W, C = y_s8_in.shape
    M = z2f.shape[-1]
    w3q, sw3 = _quant_w(p["conv3"]["kernel"].astype(jnp.float32))
    w1q, sw1 = _quant_w(next_p["conv1"]["kernel"].astype(jnp.float32))
    M2 = w1q.shape[-1]
    N = B * H * W
    out, z1 = FT.tail_conv1_int8(
        y_s8_in.reshape(N, C), _requant(z2f, s3).reshape(N, M),
        w3q.reshape(M, C), (s3 * sw3)[None, :],
        p["conv3"]["bias"].astype(jnp.float32)[None, :],
        w1q.reshape(C, M2), (s_out * sw1)[None, :],
        next_p["conv1"]["bias"].astype(jnp.float32)[None, :],
        s_in, s_out, s_next, interpret=interpret,
    )
    return out.reshape(B, H, W, C), z1.reshape(B, H, W, M2)


def _resnet_int8_carry(folded: Dict, x: jnp.ndarray, arch: str, scales: Dict,
                       fused_layers=(), fused_tails=(),
                       interpret: bool = False,
                       stem_s2d: bool = False, bias_corr: Optional[Dict] = None,
                       fp_means: Optional[Dict] = None,
                       collect_into: Optional[Dict] = None) -> jnp.ndarray:
    """int8-activation-carry forward: inter-block tensors stay s8+scale.

    Same traversal order/naming as _folded_forward (so calibrate_int8's scale
    names match), but the block residual is dequantized from s8 inside the
    conv3 epilogue instead of riding HBM as bf16. The extra quantization the
    residual suffers is covered by the int8 quality gates
    (tests/test_pipeline.py, tests/test_int8.py).

    fused_layers: layer names ('layer1', ...) whose identity bottleneck
    blocks run through the fused Pallas block kernel (same math, VMEM-
    resident intermediates — see ops/pallas/fused_block.py).

    fused_tails: layer names whose identity-block TAILS fuse with the next
    block's conv1 in one Pallas kernel (ops/pallas/fused_tail.py). The pair
    hands the next block its requantized conv1 activation (z1_pending below),
    so that block starts at conv2 — same math, one fewer HBM carry read."""
    dt = x.dtype
    block_type, stages = R.RESNET_SPECS[arch]
    need = ["conv1"]
    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            n_convs = 3 if block_type == "bottleneck" else 2
            need += [f"layer{li+1}.{bi}.conv{ci}" for ci in range(1, n_convs + 1)]
            if "downsample" in folded[f"layer{li+1}"][bi]:
                need.append(f"layer{li+1}.{bi}.downsample")
    missing = [n for n in need if n not in scales]
    if missing:
        raise ValueError(
            f"int8 scales missing {len(missing)} convs for arch={arch} "
            f"(e.g. {missing[:3]}); recalibrate with calibrate_int8"
        )

    if "wq" in folded["conv1"]:
        bias_corr = None  # prepare_encoder_inference already folded it in

    def pre(name, x_s8, x_scale, cp, strd=1, pad=None):
        """int8 conv -> fp32 PRE-ACTIVATION: acc*scale + bias (+correction).

        bias_corr: per-out-channel mean-error corrections from
        calibrate_int8_bias, added into the bias (the prepared path folds
        them offline — same association, bit-identical). fp_means
        (calibration only): measure this conv's per-channel mean against the
        true fp32 forward's, correct on the fly, and record the delta in
        collect_into — sequential correction, so downstream convs calibrate
        against already-corrected activations."""
        acc, sc = _acc_i8(x_s8, cp, x_scale, strd, pad)
        bias = cp["bias"]
        if bias_corr is not None and name in bias_corr:
            bias = bias + jnp.asarray(bias_corr[name], jnp.float32)
        y = acc.astype(jnp.float32) * sc[None, None, None, :] + bias
        if fp_means is not None:
            d = fp_means[name] - jnp.mean(y, axis=(0, 1, 2))
            collect_into[name] = d
            y = y + d
        return y

    # stem: conv1 + relu, quantize BEFORE the maxpool, pool in the s8 domain.
    # max commutes with the monotone requant, and post-relu the global max
    # survives 3x3/s2 pooling (every element is covered by a window), so
    # quantize-then-pool == pool-then-quantize BIT-EXACTLY while the stem
    # intermediate shrinks 822 MB bf16 -> 206 MB s8 and the standalone
    # quantize pass disappears (measured ~3 ms of the decode step).
    p = folded["conv1"]
    s0 = scales["conv1"]
    s_in = scales["layer1.0.conv1"]
    xq = _requant(x.astype(jnp.float32), s0)
    even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    if "wq" in p:
        # prepared stem (prepare_encoder_inference): the s2d rewrite decision
        # is baked into the weight (4x4 = rewritten, static shape under jit) —
        # the runtime flag must agree
        use_s2d = p["wq"].shape[0] == 4
        if use_s2d != bool(stem_s2d):
            raise ValueError(
                "stem_s2d flag does not match the prepared stem kernel; re-run "
                "prepare_encoder_inference with the same stem_s2d setting"
            )
        if use_s2d and not even:
            raise ValueError(
                "the prepared stem was space-to-depth-rewritten (4x4 kernel) "
                f"but the input is odd-sized {x.shape[1]}x{x.shape[2]}; re-run "
                "prepare_encoder_inference with stem_s2d=False"
            )
        stem, s0x = p, None
    else:
        # s2d packs 2x2 pixel blocks: odd inputs fall back to the plain 7x7
        use_s2d = bool(stem_s2d) and p["kernel"].shape[0] == 7 and even
        stem, s0x = _stem_s2d_conv(p, s0) if use_s2d else (p, s0)
    if use_s2d:
        # bit-exact 7x7/s2 -> s2d + 4x4/s1 rewrite (_stem_s2d_conv)
        y = jax.nn.relu(pre("conv1", _s2d(xq), s0x, stem, 1, [(2, 1), (2, 1)]))
    else:
        y = jax.nn.relu(pre("conv1", xq, s0x, stem, 2, [(3, 3), (3, 3)]))
    y_s8 = jax.lax.reduce_window(
        _requant(y, s_in), jnp.int8(-128), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )

    block_list = [
        (li, bi) for li, n_blocks in enumerate(stages) for bi in range(n_blocks)
    ]
    z1_pending = None  # next block's s8 conv1 activation from a fused tail
    for idx, (li, bi) in enumerate(block_list):
        p = folded[f"layer{li+1}"][bi]
        nm = f"layer{li+1}.{bi}"
        stride = 2 if (li > 0 and bi == 0) else 1
        last = idx == len(block_list) - 1
        s_out = None if last else scales[
            f"layer{block_list[idx+1][0]+1}.{block_list[idx+1][1]}.conv1"
        ]

        if z1_pending is None and _block_fusable(
                p, y_s8, stride, last, fused_layers, f"layer{li+1}"):
            y_s8 = _fused_identity_block(
                p, y_s8, s_in, scales[f"{nm}.conv2"], scales[f"{nm}.conv3"],
                s_out, interpret=interpret,
            )
            s_in = s_out
            continue

        def mid(name, z_s8, z_scale, cp, strd):  # conv + rescale + bias + relu
            return jax.nn.relu(pre(name, z_s8, z_scale, cp, strd))

        if block_type == "bottleneck":
            s2 = scales[f"{nm}.conv2"]
            if z1_pending is not None:
                z2_s8, z1_pending = z1_pending, None  # conv1 already done fused
            else:
                z = mid(f"{nm}.conv1", y_s8, s_in, p["conv1"], 1)
                z2_s8 = _requant(z, s2)
            z = mid(f"{nm}.conv2", z2_s8, s2, p["conv2"], stride)
            s3 = scales[f"{nm}.conv3"]
            if _tail_fusable(p, y_s8, stride, last, fused_tails, f"layer{li+1}"):
                nli, nbi = block_list[idx + 1]
                next_p = folded[f"layer{nli+1}"][nbi]
                s_next = scales[f"layer{nli+1}.{nbi}.conv2"]
                y_s8, z1_pending = _fused_tail_pair(
                    p, next_p, y_s8, z, s3, s_in, s_out, s_next, interpret
                )
                s_in = s_out
                continue
            tail = pre(f"{nm}.conv3", _requant(z, s3), s3, p["conv3"])
        else:
            z = mid(f"{nm}.conv1", y_s8, s_in, p["conv1"], stride)
            s2 = scales[f"{nm}.conv2"]
            tail = pre(f"{nm}.conv2", _requant(z, s2), s2, p["conv2"])

        if "downsample" in p:
            shortcut = pre(f"{nm}.downsample", y_s8, s_in, p["downsample"], stride)
            s_sc = scales.get(f"{nm}.downsample_out")
            if s_sc is not None:
                # keep the shortcut branch s8 too: otherwise the tail epilogue
                # reads two raw s32 accumulator streams and XLA spills one to
                # HBM at 4 bytes/elem (measured ~10 ms across the 4 downsample
                # blocks). Symmetric here: the pre-relu shortcut is signed.
                shortcut = _requant(shortcut, s_sc).astype(jnp.float32) * s_sc
        else:
            shortcut = y_s8.astype(jnp.float32) * s_in  # s8 dequant: 1 byte/elem read

        out = jax.nn.relu(tail + shortcut)
        if last:
            return out.astype(dt)
        y_s8 = _requant(out, s_out)
        s_in = s_out


def calibrate_model(model, cf, params, state, images_u8):
    """One-call int8 calibration: uint8 images -> model with baked scales.

    The single owner of the calibration contract (fp32 eval preprocess at
    train_crop_size, encoder subtree, backbone arch) shared by serving,
    bench, and tests — keep those call sites on this helper so a preprocessing
    change cannot ship mis-scaled int8 anywhere."""
    from adaptive_tpu.ops.preprocess import eval_preprocess

    calib = eval_preprocess(jnp.asarray(images_u8), cf.train_crop_size, jnp.float32)
    scales = calibrate_int8(
        params["encoder"], state, calib, cf.encoder_backbone,
        granularity=getattr(cf, "encoder_quant_granularity", "channel"),
    )
    corr = None
    if getattr(cf, "encoder_quant_bias_correct", False):
        corr = calibrate_int8_bias(
            params["encoder"], state, calib, cf.encoder_backbone, scales
        )
    return model._replace(int8_scales=scales, int8_bias_corr=corr)


def calibrate_int8(enc_params: Dict, state: Dict, images, arch: str,
                   granularity: str = "tensor") -> Dict[str, Any]:
    """One-shot PTQ calibration: run a representative (preprocessed float)
    batch through the folded fp32 forward recording each conv input's
    max-abs; returns {conv_name: scale} for static int8 inference.

    granularity='tensor' -> float scales (one per conv input);
    granularity='channel' -> np.float32 [Cin] vectors (per-channel activation
    resolution; the forward folds them into the kernels, see _acc_i8 — same
    fused epilogues, better quantization SNR since post-BN-fold channel
    ranges differ by orders of magnitude).

    Jitted as one program (a single compile; eager would dispatch ~150
    separate conv compiles). Uses the same traversal as the int8 forward, so
    scale names always match."""
    if granularity not in ("tensor", "channel"):
        raise ValueError(f"granularity={granularity!r} — must be tensor|channel")
    axes = None if granularity == "tensor" else (0, 1, 2)

    @jax.jit
    def amaxes(enc_params, state, images):
        folded = fold_resnet(enc_params["resnet"], state["resnet"], arch)
        out: Dict[str, jnp.ndarray] = {}

        def conv(name, xx, p, stride, pad):
            out[name] = jnp.max(jnp.abs(xx.astype(jnp.float32)), axis=axes)
            y = _plain_conv(name, xx, p, stride, pad)
            if name.endswith("downsample"):
                # shortcut-branch OUTPUT scale: lets the int8-carry forward
                # keep the downsample branch s8 (no s32 accumulator spill)
                out[name + "_out"] = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=axes)
            return y

        _folded_forward(folded, images.astype(jnp.float32), arch, conv)
        return out

    raw = jax.device_get(amaxes(enc_params, state, images))
    if granularity == "tensor":
        return {k: max(float(v), 1e-8) / 127.0 for k, v in raw.items()}
    return {
        k: np.maximum(np.asarray(v, np.float32), 1e-8) / np.float32(127.0)
        for k, v in raw.items()
    }


def calibrate_int8_bias(enc_params: Dict, state: Dict, images, arch: str,
                        scales: Dict) -> Dict[str, np.ndarray]:
    """Sequential int8 bias correction (Nagel et al. 2019 style, zero runtime
    cost): per conv, the per-out-channel mean of the quantized pre-activation
    is matched to the exact fp32 forward's mean on the calibration batch.

    Pass 1 records the fp32 means; pass 2 walks the ACTUAL int8-carry forward
    (same code path as inference, _resnet_int8_carry's `pre`), corrects each
    conv on the fly, and records the deltas — so every conv is calibrated
    against already-corrected upstream activations. Returns {conv_name:
    np.float32 [Cout]} to add into the conv biases (calibrate_model attaches
    them; prepare_encoder_inference folds them in offline)."""

    @jax.jit
    def run(enc_params, state, images):
        folded = fold_resnet(enc_params["resnet"], state["resnet"], arch)
        xf = images.astype(jnp.float32)
        means: Dict[str, jnp.ndarray] = {}

        def conv(name, xx, p, stride, pad):
            y = _plain_conv(name, xx, p, stride, pad)
            means[name] = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
            return y

        _folded_forward(folded, xf, arch, conv)
        collected: Dict[str, jnp.ndarray] = {}
        _resnet_int8_carry(folded, xf, arch, scales,
                           fp_means=means, collect_into=collected)
        return collected

    out = jax.device_get(run(enc_params, state, images))
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def prepare_encoder_inference(
    enc_params: Dict, state: Dict, arch: str, dtype, quant: str = "none",
    scales: Optional[Dict] = None, stem_s2d: bool = False,
    quantize_weights: bool = True, bias_corr: Optional[Dict] = None,
) -> Dict:
    """Offline inference weight preparation — jit once per checkpoint.

    Returns the tree encoder_apply_inference consumes via `prepared=`:
    BN-folded convs, compute-dtype cast for the float path or
    {'wq','scale','bias'} int8-quantized (activation scales pre-combined /
    per-channel scales folded into the kernels, _quant_conv_weight) for the
    static-scale int8 path, plus the compute-dtype affine heads. Hoisting
    this out of the per-batch decode program removes every weight pass (BN
    fold, scale fold, quantize round/clip/cast, dtype cast) from the decode
    hot loop — they otherwise re-run per batch because params are traced
    arguments, not constants."""
    folded = fold_resnet(enc_params["resnet"], state["resnet"], arch)
    if quant == "int8" and scales is not None and quantize_weights:
        block_type, stages = R.RESNET_SPECS[arch]
        n_convs = 3 if block_type == "bottleneck" else 2

        def prep_bias(p, key):
            b = p["bias"].astype(jnp.float32)
            if bias_corr is not None and key in bias_corr:
                # calibrate_int8_bias mean-error correction, folded offline
                # (the inline path adds it with the same association)
                b = b + jnp.asarray(bias_corr[key], jnp.float32)
            return b

        def prep(p, key):
            wq, sc = _quant_conv_weight(p["kernel"], scales[key])
            return {"wq": wq, "scale": sc, "bias": prep_bias(p, key)}

        stem = folded["conv1"]
        use_s2d = bool(stem_s2d) and stem["kernel"].shape[0] == 7
        src, s0x = (_stem_s2d_conv(stem, scales["conv1"]) if use_s2d
                    else (stem, scales["conv1"]))
        wq, sc = _quant_conv_weight(src["kernel"], s0x)
        # NOTE: no explicit s2d marker — a bool leaf would be traced under
        # jit; the 4x4-vs-7x7 wq shape (static) carries the decision
        out: Dict[str, Any] = {"conv1": {
            "wq": wq, "scale": sc, "bias": prep_bias(stem, "conv1"),
        }}
        for li, n_blocks in enumerate(stages):
            blocks = []
            for bi in range(n_blocks):
                p = folded[f"layer{li+1}"][bi]
                nm = f"layer{li+1}.{bi}"
                fp = {f"conv{ci}": prep(p[f"conv{ci}"], f"{nm}.conv{ci}")
                      for ci in range(1, n_convs + 1)}
                if "downsample" in p:
                    # the downsample input IS the block input: its calibrated
                    # scale equals conv1's (same tensor, same max)
                    fp["downsample"] = prep(p["downsample"], f"{nm}.downsample")
                blocks.append(fp)
            out[f"layer{li+1}"] = blocks
        folded = out
    elif quant != "int8":
        folded = cast_floating(folded, dtype)
    # int8 with scales=None (dynamic fallback) keeps the fp32 folded tree —
    # that path re-quantizes per batch by design.
    prepared = {"resnet": folded}
    for name in ("affine_a", "affine_b", "affine_h0", "affine_c0"):
        prepared[name] = cast_floating(enc_params[name], dtype)
    return prepared


def encoder_apply_inference(
    enc_params: Dict, state: Dict, images: jnp.ndarray, arch: str, dtype,
    quant: str = "none", scales: Optional[Dict] = None, fused_layers=(),
    fused_tails=(), stem_s2d: bool = False, prepared: Optional[Dict] = None,
    bias_corr: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Folded, dtype-cast encoder forward: images (preprocessed float NHWC) ->
    (V, v_g, h0, c0). Matches encoder_apply(train=False); quant='int8' uses
    int8 convs (static scales if calibrated, else dynamic); fused_layers /
    fused_tails select layers for the fused Pallas kernels (TPU only).
    prepared: tree from prepare_encoder_inference — skips every per-batch
    weight pass (identical math: same ops, hoisted)."""
    from adaptive_tpu.ops import inits

    if prepared is not None:
        folded = prepared["resnet"]
        aff = lambda name: prepared[name]
    else:
        # keep folded kernels fp32 for int8: quantization from bf16-rounded
        # weights would diverge from the fp32-calibrated scales (and costs an
        # extra full-weight cast pass)
        folded = fold_resnet(enc_params["resnet"], state["resnet"], arch)
        if quant != "int8":
            folded = cast_floating(folded, dtype)
        aff = lambda name: cast_floating(enc_params[name], dtype)
    if quant == "int8":
        A = resnet_apply_folded_int8(
            folded, images.astype(dtype), arch, scales, fused_layers,
            fused_tails, stem_s2d=stem_s2d, bias_corr=bias_corr,
        )
    else:
        A = resnet_apply_folded(folded, images.astype(dtype), arch)
    B, Hf, Wf, C = A.shape
    A_flat = A.reshape(B, Hf * Wf, C)
    a_g = jnp.mean(A_flat.astype(jnp.float32), axis=1).astype(dtype)

    V = jax.nn.relu(inits.linear(aff("affine_a"), A_flat))
    v_g = jax.nn.relu(inits.linear(aff("affine_b"), a_g))
    h0 = jnp.tanh(inits.linear(aff("affine_h0"), a_g))
    c0 = jnp.tanh(inits.linear(aff("affine_c0"), a_g))
    return V, v_g, h0, c0
