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


def resnet_apply_folded(folded: Dict, x: jnp.ndarray, arch: str) -> jnp.ndarray:
    """BN-free inference forward; equals resnet_apply(train=False)."""
    block_type, stages = R.RESNET_SPECS[arch]
    y = jax.lax.conv_general_dilated(
        x, folded["conv1"]["kernel"].astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + folded["conv1"]["bias"].astype(x.dtype)
    y = jax.nn.relu(y)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            p = folded[f"layer{li+1}"][bi]
            stride = 2 if (li > 0 and bi == 0) else 1
            if block_type == "bottleneck":
                z = jax.nn.relu(_conv_b(y, p["conv1"]))
                z = jax.nn.relu(_conv_b(z, p["conv2"], stride))
                z = _conv_b(z, p["conv3"])
            else:
                z = jax.nn.relu(_conv_b(y, p["conv1"], stride))
                z = _conv_b(z, p["conv2"])
            sc = _conv_b(y, p["downsample"], stride) if "downsample" in p else y
            y = jax.nn.relu(z + sc)
    return y


# ------------------------------------------------------------- int8 path
# Dynamic symmetric quantization: per-output-channel int8 weights, per-tensor
# int8 activations (scale from the live batch max). v5e's int8 MXU runs ~1.4x
# bf16 for the compute-bound mid layers; the extra quantize pass is one
# VPU read+write of the activation. Accumulation in int32, rescale + bias +
# relu in fp32/bf16 between convs. Opt-in serving mode (encoder_quant='int8');
# expected sub-1% quality delta typical of PTQ ResNets — validate on real
# data before production use.

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
    y = acc.astype(jnp.float32) * (sx * sw)[None, None, None, :] + p["bias"]
    return y.astype(out_dtype)


def _int8_layers(folded: Dict, arch: str):
    """Yield (name, params, stride, pad) for every conv in forward order."""
    block_type, stages = R.RESNET_SPECS[arch]
    yield "conv1", folded["conv1"], 2, [(3, 3), (3, 3)]
    n_convs = 3 if block_type == "bottleneck" else 2
    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            p = folded[f"layer{li+1}"][bi]
            stride = 2 if (li > 0 and bi == 0) else 1
            for ci in range(1, n_convs + 1):
                yield f"layer{li+1}.{bi}.conv{ci}", p[f"conv{ci}"], stride, None
            if "downsample" in p:
                yield f"layer{li+1}.{bi}.downsample", p["downsample"], stride, None


def resnet_apply_folded_int8(
    folded: Dict, x: jnp.ndarray, arch: str, scales: Optional[Dict] = None
) -> jnp.ndarray:
    """BN-folded int8-conv inference forward.

    scales: optional {conv_name: float} calibrated per-conv input scales
    (see calibrate_int8). With static scales, quantization is elementwise and
    fuses; without, each conv pays a dynamic full-tensor max reduce.
    """
    block_type, stages = R.RESNET_SPECS[arch]
    dt = x.dtype
    s = (scales or {}).get
    y = jax.nn.relu(
        _conv_i8(x, folded["conv1"], 2, dt, s("conv1"), [(3, 3), (3, 3)])
    )
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            p = folded[f"layer{li+1}"][bi]
            nm = f"layer{li+1}.{bi}"
            stride = 2 if (li > 0 and bi == 0) else 1
            if block_type == "bottleneck":
                z = jax.nn.relu(_conv_i8(y, p["conv1"], 1, dt, s(f"{nm}.conv1")))
                z = jax.nn.relu(_conv_i8(z, p["conv2"], stride, dt, s(f"{nm}.conv2")))
                z = _conv_i8(z, p["conv3"], 1, dt, s(f"{nm}.conv3"))
            else:
                z = jax.nn.relu(_conv_i8(y, p["conv1"], stride, dt, s(f"{nm}.conv1")))
                z = _conv_i8(z, p["conv2"], 1, dt, s(f"{nm}.conv2"))
            sc = (
                _conv_i8(y, p["downsample"], stride, dt, s(f"{nm}.downsample"))
                if "downsample" in p
                else y
            )
            y = jax.nn.relu(z + sc)
    return y


def calibrate_int8(enc_params: Dict, state: Dict, images, arch: str) -> Dict[str, float]:
    """One-shot PTQ calibration: run a representative (preprocessed float)
    batch through the folded fp32 forward recording each conv input's
    max-abs; returns {conv_name: scale} for static int8 inference.

    Jitted as one program (a single compile; eager would dispatch ~150
    separate conv compiles)."""

    @jax.jit
    def amaxes(enc_params, state, images):
        folded = fold_resnet(enc_params["resnet"], state["resnet"], arch)
        out: Dict[str, jnp.ndarray] = {}

        def record(name, x):
            out[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            return x

        block_type, stages = R.RESNET_SPECS[arch]
        x = images.astype(jnp.float32)
        record("conv1", x)
        y = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, folded["conv1"]["kernel"], (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + folded["conv1"]["bias"]
        )
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        for li, n_blocks in enumerate(stages):
            for bi in range(n_blocks):
                p = folded[f"layer{li+1}"][bi]
                nm = f"layer{li+1}.{bi}"
                stride = 2 if (li > 0 and bi == 0) else 1
                if block_type == "bottleneck":
                    z = jax.nn.relu(_conv_b(record(f"{nm}.conv1", y), p["conv1"]))
                    z = jax.nn.relu(_conv_b(record(f"{nm}.conv2", z), p["conv2"], stride))
                    z = _conv_b(record(f"{nm}.conv3", z), p["conv3"])
                else:
                    z = jax.nn.relu(_conv_b(record(f"{nm}.conv1", y), p["conv1"], stride))
                    z = _conv_b(record(f"{nm}.conv2", z), p["conv2"])
                if "downsample" in p:
                    record(f"{nm}.downsample", y)
                    sc = _conv_b(y, p["downsample"], stride)
                else:
                    sc = y
                y = jax.nn.relu(z + sc)
        return out

    raw = jax.device_get(amaxes(enc_params, state, images))
    return {k: max(float(v), 1e-8) / 127.0 for k, v in raw.items()}


def encoder_apply_inference(
    enc_params: Dict, state: Dict, images: jnp.ndarray, arch: str, dtype,
    quant: str = "none", scales: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Folded, dtype-cast encoder forward: images (preprocessed float NHWC) ->
    (V, v_g, h0, c0). Matches encoder_apply(train=False); quant='int8' uses
    int8 convs (static scales if calibrated, else dynamic)."""
    from adaptive_tpu.ops import inits

    folded = cast_floating(fold_resnet(enc_params["resnet"], state["resnet"], arch), dtype)
    if quant == "int8":
        A = resnet_apply_folded_int8(folded, images.astype(dtype), arch, scales)
    else:
        A = resnet_apply_folded(folded, images.astype(dtype), arch)
    B, Hf, Wf, C = A.shape
    A_flat = A.reshape(B, Hf * Wf, C)
    a_g = jnp.mean(A_flat.astype(jnp.float32), axis=1).astype(dtype)

    aff = lambda name: cast_floating(enc_params[name], dtype)
    V = jax.nn.relu(inits.linear(aff("affine_a"), A_flat))
    v_g = jax.nn.relu(inits.linear(aff("affine_b"), a_g))
    h0 = jnp.tanh(inits.linear(aff("affine_h0"), a_g))
    c0 = jnp.tanh(inits.linear(aff("affine_c0"), a_g))
    return V, v_g, h0, c0
