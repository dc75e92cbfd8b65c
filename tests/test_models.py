"""Model-level tests: shapes, variant dispatch, train/decode-step consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.models.factory import build_model, get_model


@pytest.fixture(scope="module", params=["baseline_attention", "adaptive_attention", "rnn_attention"])
def variant(request):
    return request.param


def _tiny(tiny_cf, variant):
    cf = tiny_cf.replace(atten_model_name=variant)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    return cf, model, params, state


def test_forward_shapes(tiny_cf, variant):
    cf, model, params, state = _tiny(tiny_cf, variant)
    B, T = 2, 6
    images = jnp.asarray(np.random.default_rng(0).normal(size=(B, 64, 64, 3)), jnp.float32)
    captions = jnp.asarray(np.random.default_rng(1).integers(0, cf.vocab_length, (B, T)), jnp.int32)
    scores, (alpha, beta), new_state = model.forward(params, state, images, captions, train=False)
    K = (64 // 32) ** 2
    assert scores.shape == (B, T, cf.vocab_length)
    assert alpha.shape == (B, T, K)
    if variant == "adaptive_attention":
        assert beta.shape == (B, T, 1)
        assert (np.asarray(beta) >= 0).all() and (np.asarray(beta) <= 1).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_encode_shapes(tiny_cf, variant):
    cf, model, params, state = _tiny(tiny_cf, variant)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    V, v_g, h0, c0, _ = model.encode(params, state, images)
    K = (64 // 32) ** 2
    assert V.shape == (2, K, cf.lstm_hidden_size)
    assert v_g.shape == (2, cf.word_embed_size)
    assert h0.shape == c0.shape == (2, cf.lstm_hidden_size)


def test_decode_step_matches_teacher_forcing_first_step(tiny_cf, variant):
    """At t=0 the train path's sentinel h_prev is zero, identical to the
    sampler's per-step call — so decode_step(token0) must equal forward()[:,0]."""
    cf, model, params, state = _tiny(tiny_cf, variant)
    B = 2
    images = jnp.asarray(np.random.default_rng(2).normal(size=(B, 64, 64, 3)), jnp.float32)
    captions = jnp.ones((B, 3), jnp.int32)  # <start>
    scores, _, _ = model.forward(params, state, images, captions, train=False)

    V, v_g, h0, c0, _ = model.encode(params, state, images)
    dstate = model.init_decode_state(h0, c0)
    logits, alpha, beta, dstate2 = model.decode_step(params, captions[:, 0], v_g, dstate, V)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(scores[:, 0, :]), atol=1e-5)


def test_decode_step_carries_state(tiny_cf):
    """Greedy two-step decode must equal teacher forcing on the argmax path
    when sentinel_uses_prev_hidden=True (true recurrence)."""
    cf, model, params, state = _tiny(tiny_cf, "adaptive_attention")
    B = 2
    images = jnp.asarray(np.random.default_rng(3).normal(size=(B, 64, 64, 3)), jnp.float32)
    V, v_g, h0, c0, _ = model.encode(params, state, images)
    dstate = model.init_decode_state(h0, c0)
    tok0 = jnp.ones((B,), jnp.int32)
    logits0, _, _, dstate = model.decode_step(params, tok0, v_g, dstate, V, True)
    tok1 = jnp.argmax(logits0, -1).astype(jnp.int32)
    logits1, _, _, dstate = model.decode_step(params, tok1, v_g, dstate, V, True)

    captions = jnp.stack([tok0, tok1], axis=1)
    scores, _, _ = model.forward(params, state, images, captions)
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(scores[:, 0, :]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(scores[:, 1, :]), atol=1e-5)


def test_get_model_start_epoch(tiny_cf):
    model, params, state, start_epoch = get_model(tiny_cf)
    assert start_epoch == 1
    assert model.variant == "adaptive_attention"


def test_variants_have_distinct_params(tiny_cf):
    _, _, p_base, _ = _tiny(tiny_cf, "baseline_attention")
    _, _, p_adap, _ = _tiny(tiny_cf, "adaptive_attention")
    assert "sentinel" not in p_base["decoder"]["adaptive"]
    assert "sentinel" in p_adap["decoder"]["adaptive"]
    assert "affine_s" in p_adap["decoder"]["adaptive"]["atten"]


def test_bn_state_updates_in_train_mode(tiny_cf):
    cf, model, params, state = _tiny(tiny_cf, "baseline_attention")
    images = jnp.asarray(np.random.default_rng(4).normal(size=(2, 64, 64, 3)), jnp.float32)
    captions = jnp.ones((2, 3), jnp.int32)
    _, _, state_eval = model.forward(params, state, images, captions, train=False)
    _, _, state_train = model.forward(params, state, images, captions, train=True)
    same = np.allclose(
        np.asarray(state_eval["resnet"]["bn1"]["mean"]),
        np.asarray(state_train["resnet"]["bn1"]["mean"]),
    )
    assert not same, "train mode must update BN running stats"
