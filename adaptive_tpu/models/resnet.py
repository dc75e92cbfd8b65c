"""ResNet backbone (v1, torchvision-compatible) as pure JAX functions.

Reference parity: the encoder's backbone is ``torchvision.models.resnet152``
minus fc/avgpool (reference code_src/models/baseline_attention.py:16-18),
producing a 7x7x2048 feature map from 224x224 input. This is a ground-up
NHWC implementation whose parameter tree mirrors torchvision's module names
(conv1/bn1/layer{1..4}/{blocks}/conv{1..3},bn{1..3},downsample) so converted
pretrained weights drop in 1:1 (see models/torch_import.py).

TPU notes: NHWC + HWIO kernels (XLA's preferred conv layout), bf16-friendly
(params stay fp32, activations cast per config), BatchNorm running stats kept
in a separate mutable `state` pytree threaded through the train step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

# torchvision resnet depth -> (block type, stage sizes)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),  # baseline_attention.py:16
}

BN_MOMENTUM = 0.1  # torch BatchNorm2d default
BN_EPS = 1e-5

Params = Dict[str, Any]
State = Dict[str, Any]


# --------------------------------------------------------------------- inits
def _conv_init(key, kh, kw, cin, cout):
    # torchvision resnet: kaiming_normal_(mode='fan_out', nonlinearity='relu')
    fan_out = kh * kw * cout
    std = jnp.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)


def _bn_init(c):
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


# ------------------------------------------------------------------- builder
def init_resnet(key, arch: str = "resnet152") -> Tuple[Params, State]:
    block_type, stages = RESNET_SPECS[arch]
    expansion = 4 if block_type == "bottleneck" else 1
    keys = iter(jax.random.split(key, 2048))

    params: Params = {}
    state: State = {}
    params["conv1"] = {"kernel": _conv_init(next(keys), 7, 7, 3, 64)}
    params["bn1"], state["bn1"] = _bn_init(64)

    cin = 64
    for li, n_blocks in enumerate(stages):
        width = 64 * (2**li)
        cout = width * expansion
        blocks_p, blocks_s = [], []
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            has_down = bi == 0 and (stride != 1 or cin != cout)
            if block_type == "bottleneck":
                p, s = _init_bottleneck(next(keys), cin, width, cout, has_down)
            else:
                p, s = _init_basic(next(keys), cin, width, has_down, stride)
            blocks_p.append(p)
            blocks_s.append(s)
            cin = cout
        params[f"layer{li+1}"] = blocks_p
        state[f"layer{li+1}"] = blocks_s
    return params, state


def _init_bottleneck(key, cin, width, cout, has_down):
    k = iter(jax.random.split(key, 8))
    p: Params = {
        "conv1": {"kernel": _conv_init(next(k), 1, 1, cin, width)},
        "conv2": {"kernel": _conv_init(next(k), 3, 3, width, width)},
        "conv3": {"kernel": _conv_init(next(k), 1, 1, width, cout)},
    }
    s: State = {}
    p["bn1"], s["bn1"] = _bn_init(width)
    p["bn2"], s["bn2"] = _bn_init(width)
    p["bn3"], s["bn3"] = _bn_init(cout)
    if has_down:
        p["downsample"] = {"conv": {"kernel": _conv_init(next(k), 1, 1, cin, cout)}}
        p["downsample"]["bn"], s["downsample_bn"] = _bn_init(cout)
    return p, s


def _init_basic(key, cin, width, has_down, stride):
    k = iter(jax.random.split(key, 4))
    p: Params = {
        "conv1": {"kernel": _conv_init(next(k), 3, 3, cin, width)},
        "conv2": {"kernel": _conv_init(next(k), 3, 3, width, width)},
    }
    s: State = {}
    p["bn1"], s["bn1"] = _bn_init(width)
    p["bn2"], s["bn2"] = _bn_init(width)
    if has_down:
        p["downsample"] = {"conv": {"kernel": _conv_init(next(k), 1, 1, cin, width)}}
        p["downsample"]["bn"], s["downsample_bn"] = _bn_init(width)
    return p, s


# -------------------------------------------------------------------- apply
def _conv(x, kernel, stride=1):
    # torch pads (k-1)//2 on BOTH sides; XLA's "SAME" pads asymmetrically for
    # stride 2, which would misalign pretrained torch weights — so explicit.
    # Routed through ops.quant_conv so the experimental int8-backward mode
    # (bench.py --mode train --conv-bwd-quant) can swap the VJP; the default
    # mode is a plain conv_general_dilated, bit-identical to before.
    from adaptive_tpu.ops.quant_conv import conv_nhwc

    return conv_nhwc(x, kernel, stride)


def _bn_batch_moments(x: jnp.ndarray, shift: jnp.ndarray):
    """(mean, biased var) over (N,H,W), fp32 accumulation, one fused pass.

    Shifted two-moment form: shifting by the running mean keeps the
    E[x^2]-E[x]^2 cancellation harmless (the naive form loses all precision
    for |mean|/std >~ 1e3; shifted, the ratio is measured against the running
    mean, which tracks the batch mean closely). The shift cancels exactly in
    the returned moments, so its gradient is identically zero.
    """
    n = x.shape[0] * x.shape[1] * x.shape[2]
    xs = x.astype(jnp.float32) - shift
    s1 = jnp.sum(xs, axis=(0, 1, 2))
    s2 = jnp.sum(xs * xs, axis=(0, 1, 2))
    dmean = s1 / n
    mean = dmean + shift
    var = jnp.maximum(s2 / n - dmean * dmean, 0.0)
    return mean, var


@jax.custom_vjp
def _bn_train(x, scale, bias, shift):
    """Train-mode BN core: (y, batch mean, biased batch var).

    custom_vjp pins the memory plan XLA's autodiff misses: the forward is one
    multi-output reduce + one normalize pass, the backward is the canonical
    two-reduction form (dbeta=Σdy, dgamma=Σdy·x̂) + one elementwise pass, and
    the only saved activation is `x` at its own (bf16) dtype — autodiff kept
    the fp32 shifted intermediate alive, ~doubling BN HBM traffic (this was
    ~30% of the train step's device time).

    NOTE: the mean/var outputs feed the *running stats* (non-differentiated
    state); their cotangents are intentionally dropped in the backward.
    """
    mean, var = _bn_batch_moments(x, shift)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x.astype(jnp.float32) - mean) * (inv * scale) + bias
    return y.astype(x.dtype), mean, var


def _bn_train_fwd(x, scale, bias, shift):
    mean, var = _bn_batch_moments(x, shift)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x.astype(jnp.float32) - mean) * (inv * scale) + bias
    return (y.astype(x.dtype), mean, var), (x, mean, inv, scale)


def _bn_train_bwd(res, cots):
    x, mean, inv, scale = res
    dy = cots[0].astype(jnp.float32)  # mean/var cotangents: state-only, dropped
    n = x.shape[0] * x.shape[1] * x.shape[2]
    xhat = (x.astype(jnp.float32) - mean) * inv
    sum_dy = jnp.sum(dy, axis=(0, 1, 2))
    sum_dy_xhat = jnp.sum(dy * xhat, axis=(0, 1, 2))
    dx = (scale * inv) * (dy - sum_dy / n - xhat * (sum_dy_xhat / n))
    return dx.astype(x.dtype), sum_dy_xhat, sum_dy, jnp.zeros_like(mean)


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def _bn(x, p, s, train: bool):
    """BatchNorm2d. Returns (y, new_state). Stats math in fp32."""
    if train:
        y, mean, var = _bn_train(x, p["scale"], p["bias"], s["mean"])
        n = x.shape[0] * x.shape[1] * x.shape[2]
        # torch tracks *unbiased* running var
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
        return y, new_s
    mean, var = s["mean"], s["var"]
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), s


def _bottleneck_apply(x, p, s, train, stride):
    y, s1 = _bn(_conv(x, p["conv1"]["kernel"]), p["bn1"], s["bn1"], train)
    y = jax.nn.relu(y)
    y, s2 = _bn(_conv(y, p["conv2"]["kernel"], stride=stride), p["bn2"], s["bn2"], train)
    y = jax.nn.relu(y)
    y, s3 = _bn(_conv(y, p["conv3"]["kernel"]), p["bn3"], s["bn3"], train)
    new_s = {"bn1": s1, "bn2": s2, "bn3": s3}
    if "downsample" in p:
        sc, sd = _bn(
            _conv(x, p["downsample"]["conv"]["kernel"], stride=stride),
            p["downsample"]["bn"],
            s["downsample_bn"],
            train,
        )
        new_s["downsample_bn"] = sd
    else:
        sc = x
    return jax.nn.relu(y + sc), new_s


def _basic_apply(x, p, s, train, stride):
    y, s1 = _bn(_conv(x, p["conv1"]["kernel"], stride=stride), p["bn1"], s["bn1"], train)
    y = jax.nn.relu(y)
    y, s2 = _bn(_conv(y, p["conv2"]["kernel"]), p["bn2"], s["bn2"], train)
    new_s = {"bn1": s1, "bn2": s2}
    if "downsample" in p:
        sc, sd = _bn(
            _conv(x, p["downsample"]["conv"]["kernel"], stride=stride),
            p["downsample"]["bn"],
            s["downsample_bn"],
            train,
        )
        new_s["downsample_bn"] = sd
    else:
        sc = x
    return jax.nn.relu(y + sc), new_s


def resnet_apply(
    params: Params, state: State, x: jnp.ndarray, arch: str, train: bool = False
) -> Tuple[jnp.ndarray, State]:
    """NHWC images -> final conv feature map [B, H/32, W/32, C_out], new state.

    Equivalent to torchvision resnet with fc+avgpool removed
    (baseline_attention.py:17-18). 224x224 -> 7x7 map.
    """
    block_type, stages = RESNET_SPECS[arch]
    apply_block = _bottleneck_apply if block_type == "bottleneck" else _basic_apply

    # Stem: 7x7/2 conv (torch pads 3), BN, relu, 3x3/2 maxpool (torch pads 1).
    y = jax.lax.conv_general_dilated(
        x,
        params["conv1"]["kernel"].astype(x.dtype),
        (2, 2),
        [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    new_state: State = {}
    y, new_state["bn1"] = _bn(y, params["bn1"], state["bn1"], train)
    y = jax.nn.relu(y)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )

    for li, n_blocks in enumerate(stages):
        bp, bs = params[f"layer{li+1}"], state[f"layer{li+1}"]
        new_bs = []
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            y, ns = apply_block(y, bp[bi], bs[bi], train, stride)
            new_bs.append(ns)
        new_state[f"layer{li+1}"] = new_bs
    return y, new_state


def feature_channels(arch: str) -> int:
    block_type, _ = RESNET_SPECS[arch]
    return 2048 if block_type == "bottleneck" else 512


# torchvision child order of the truncated backbone:
# [conv1, bn1, relu, maxpool, layer1, layer2, layer3, layer4]
# (model_factory.py:35 slices children()[start_layer:]).
CHILD_NAMES = ["conv1", "bn1", "relu", "maxpool", "layer1", "layer2", "layer3", "layer4"]


def finetune_mask(params: Params, start_layer: int) -> Params:
    """Boolean pytree: True for params in children [start_layer:]
    (model_factory.py:27-39). relu/maxpool have no params."""
    trainable = set(n for n in CHILD_NAMES[start_layer:] if n not in ("relu", "maxpool"))

    def mark(name, sub):
        return jax.tree.map(lambda _: name in trainable, sub)

    return {name: mark(name, sub) for name, sub in params.items()}
