"""Vocab padding (MXU/TP alignment) must not change any output: padded model
with zero-padded weights == unpadded model, for loss, scores, and samples."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_tpu.models.factory import build_model
from adaptive_tpu.models.torch_import import pad_vocab_params
from adaptive_tpu.training.step import masked_ce_loss


def test_padded_model_matches_unpadded(tiny_cf):
    cf0 = tiny_cf.replace(vocab_length=30, vocab_pad_multiple=1)
    cf1 = tiny_cf.replace(vocab_length=30, vocab_pad_multiple=16)  # -> 32
    m0, m1 = build_model(cf0), build_model(cf1)
    assert m1.spec.padded_vocab == 32 and m0.spec.padded_vocab == 0

    params0, state = m0.init(jax.random.PRNGKey(0))
    params1 = dict(params0)
    params1["decoder"] = jax.tree.map(
        jnp.asarray, pad_vocab_params(jax.tree.map(np.asarray, params0["decoder"]), 32)
    )

    rng = np.random.default_rng(0)
    B, T = 2, 5
    images = jnp.asarray(rng.normal(size=(B, 64, 64, 3)), jnp.float32)
    captions = jnp.asarray(rng.integers(1, 30, (B, T)), jnp.int32)
    lengths = jnp.asarray([5, 4], jnp.int32)

    s0, _, _ = m0.forward(params0, state, images, captions)
    s1, _, _ = m1.forward(params1, state, images, captions)
    assert s1.shape[-1] == 32
    np.testing.assert_allclose(np.asarray(s1[..., :30]), np.asarray(s0), atol=1e-5)

    l0 = masked_ce_loss(s0, captions, lengths)
    l1 = masked_ce_loss(s1, captions, lengths)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    # greedy decode parity (argmax never selects a padded column)
    V0, vg0, h00, c00, _ = m0.encode(params0, state, images)
    d0 = m0.init_decode_state(h00, c00)
    d1 = m1.init_decode_state(h00, c00)
    t0 = t1 = jnp.ones((B,), jnp.int32)
    for _ in range(6):
        lg0, _, _, d0 = m0.decode_step(params0, t0, vg0, d0, V0)
        lg1, _, _, d1 = m1.decode_step(params1, t1, vg0, d1, V0)
        t0 = jnp.argmax(lg0, -1).astype(jnp.int32)
        t1 = jnp.argmax(lg1, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    assert int(jnp.max(t1)) < 30


def test_padded_vocab_grads_flow_only_to_real_columns(tiny_cf):
    cf = tiny_cf.replace(vocab_length=30, vocab_pad_multiple=16)
    m = build_model(cf)
    params, state = m.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    captions = jnp.asarray(rng.integers(1, 30, (2, 5)), jnp.int32)
    lengths = jnp.asarray([5, 5], jnp.int32)

    def loss_fn(p):
        s, _, _ = m.forward(p, state, images, captions)
        return masked_ce_loss(s, captions, lengths)

    g = jax.grad(loss_fn)(params)
    gk = np.asarray(g["decoder"]["adaptive"]["mlp"]["kernel"])
    assert np.abs(gk[:, :30]).max() > 0
    np.testing.assert_array_equal(gk[:, 30:], 0.0)
