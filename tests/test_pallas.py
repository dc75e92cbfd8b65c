"""Pallas fused decode-step kernel vs. the jnp reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.ops import attention as att
from adaptive_tpu.ops.pallas.fused_step import adaptive_attention_step_fused


@pytest.mark.parametrize("B,K,H,E2", [(3, 4, 16, 8), (8, 49, 32, 12)])
def test_fused_step_matches_jnp(B, K, H, E2):
    rng = np.random.default_rng(0)
    D = K
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    atten = {
        "affine_v": {"kernel": f(H, D)},
        "affine_g": {"kernel": f(H, D)},
        "affine_s": {"kernel": f(H, D)},
        "affine_h": {"kernel": f(D, 1)},
    }
    sentinel = {"affine_x": {"kernel": f(E2, H)}, "affine_h": {"kernel": f(H, H)}}
    x, h, cell, hp = f(B, E2), f(B, H), f(B, H), f(B, H)
    V = f(B, K, H)
    pv = att.precompute_slots(atten, V)

    # jnp reference path (sequence len 1)
    s = att.sentinel_gate(sentinel, x[:, None], hp[:, None], cell[:, None])
    want_chat, want_alpha, want_beta = att.adaptive_attention(atten, V, h[:, None], s, pv)

    got_chat, got_alpha, got_beta = adaptive_attention_step_fused(
        atten, sentinel, x, h, cell, hp, V, pv, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_chat), np.asarray(want_chat[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_alpha), np.asarray(want_alpha[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_beta), np.asarray(want_beta[:, 0]), atol=1e-5)


def test_fused_step_handles_nondivisible_batch():
    # B=5 pads to 8; results for real rows must be unaffected by padding
    rng = np.random.default_rng(1)
    B, K, H, E2 = 5, 4, 16, 8
    D = K
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    atten = {
        "affine_v": {"kernel": f(H, D)},
        "affine_g": {"kernel": f(H, D)},
        "affine_s": {"kernel": f(H, D)},
        "affine_h": {"kernel": f(D, 1)},
    }
    sentinel = {"affine_x": {"kernel": f(E2, H)}, "affine_h": {"kernel": f(H, H)}}
    x, h, cell, hp = f(B, E2), f(B, H), f(B, H), f(B, H)
    V = f(B, K, H)
    pv = att.precompute_slots(atten, V)
    chat, alpha, beta = adaptive_attention_step_fused(
        atten, sentinel, x, h, cell, hp, V, pv, interpret=True
    )
    assert chat.shape == (B, H) and alpha.shape == (B, K) and beta.shape == (B, 1)
    np.testing.assert_allclose(np.asarray(alpha.sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(beta) > 0).all() and (np.asarray(beta) < 1).all()
