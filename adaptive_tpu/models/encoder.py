"""Attentive CNN encoder: ResNet feature map -> (V, v_g, h0, c0).

Reference parity: AttentiveCNN (code_src/models/baseline_attention.py:11-62):
ResNet-152 minus fc/avgpool -> A [B,7,7,2048]; V = relu(affine_a(A)) over the
49 slots; a_g = global average pool; v_g = relu(affine_b(a_g));
h0 = tanh(affine_h0(a_g)); c0 = tanh(affine_c0(a_g)). Inits: affine_a/b
kaiming_uniform(relu), affine_h0/c0 xavier_uniform(tanh)
(baseline_attention.py:29,34). Slot order matches the reference's
view+transpose (row-major over the 7x7 grid).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from adaptive_tpu.models import resnet as R
from adaptive_tpu.ops import inits


def init_encoder(key, embed_size: int, hidden_size: int, arch: str) -> Tuple[Dict, Dict]:
    kr, ka, kb, kh, kc = jax.random.split(key, 5)
    rn_params, rn_state = R.init_resnet(kr, arch)
    C = R.feature_channels(arch)
    params = {
        "resnet": rn_params,
        "affine_a": inits.linear_params(ka, C, hidden_size, "kaiming_uniform", "relu"),
        "affine_b": inits.linear_params(kb, C, embed_size, "kaiming_uniform", "relu"),
        "affine_h0": inits.linear_params(kh, C, hidden_size, "xavier_uniform", "tanh"),
        "affine_c0": inits.linear_params(kc, C, hidden_size, "xavier_uniform", "tanh"),
    }
    return params, {"resnet": rn_state}


def encoder_features(
    params: Dict, state: Dict, images: jnp.ndarray, arch: str, train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """ResNet trunk only: images NHWC float -> (A_flat [B,K,C], a_g [B,C],
    state'). Split from the affine heads (encoder_heads) so the decoder
    optimizer group's L-BFGS closure (training/lbfgs.py) can hoist the
    frozen trunk out of its inner loop — the trunk's params (resnet,
    affine_h0/c0) are not in the decoder group (optim.py::param_group_masks),
    so its output is loop-invariant during that group's step."""
    A, rn_state = R.resnet_apply(params["resnet"], state["resnet"], images, arch, train)
    B, Hf, Wf, C = A.shape
    A_flat = A.reshape(B, Hf * Wf, C)  # slot = h*W + w, same as torch view order
    a_g = jnp.mean(A_flat, axis=1)  # AvgPool2d(7) == global mean (baseline_attention.py:46-47)
    return A_flat, a_g, {"resnet": rn_state}


def encoder_heads(
    params: Dict, A_flat: jnp.ndarray, a_g: jnp.ndarray, drop=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Affine heads over the trunk features -> (V, v_g, h0, c0). drop:
    train-time dropout before each affine, where the reference's Dropout
    sits (baseline_attention.py:51-58; rate hardcoded 0 there)."""
    from adaptive_tpu.ops.dropout import maybe_drop as _d

    V = jax.nn.relu(inits.linear(params["affine_a"], _d(drop, A_flat)))
    v_g = jax.nn.relu(inits.linear(params["affine_b"], _d(drop, a_g)))
    h0 = jnp.tanh(inits.linear(params["affine_h0"], _d(drop, a_g)))
    c0 = jnp.tanh(inits.linear(params["affine_c0"], _d(drop, a_g)))
    return V, v_g, h0, c0


def encoder_apply(
    params: Dict, state: Dict, images: jnp.ndarray, arch: str, train: bool = False,
    drop=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
    """images NHWC float -> (V [B,K,H], v_g [B,E], h0 [B,H], c0 [B,H], state').

    K = (H/32)*(W/32) spatial slots (49 at 224x224).
    """
    A_flat, a_g, new_state = encoder_features(params, state, images, arch, train)
    V, v_g, h0, c0 = encoder_heads(params, A_flat, a_g, drop)
    return V, v_g, h0, c0, new_state
