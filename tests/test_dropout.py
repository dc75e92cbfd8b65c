"""Train-time dropout (config knob train_dropout_rate; ops/dropout.py).

Reference parity: every affine site in the reference carries nn.Dropout(0)
(baseline_attention.py:26,73,111; adaptive_attention.py:21,70,103), i.e.
dropout exists in the architecture but the rate is hardcoded to zero. These
tests pin (a) rate=0 == the no-dropout path bit-exactly, (b) torch-style
inverted-dropout semantics when active, (c) eval is never affected, and
(d) the train step runs and differentiates with dropout on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.models.factory import build_model
from adaptive_tpu.ops.dropout import make_dropout, maybe_drop


# ------------------------------------------------------------------ unit level
def test_make_dropout_inactive():
    assert make_dropout(None, 0.5) is None
    assert make_dropout(jax.random.PRNGKey(0), 0.0) is None
    x = jnp.ones((3, 4))
    assert maybe_drop(None, x) is x


def test_make_dropout_rejects_bad_rate():
    with pytest.raises(ValueError):
        make_dropout(jax.random.PRNGKey(0), 1.0)
    with pytest.raises(ValueError):
        make_dropout(jax.random.PRNGKey(0), -0.1)


def test_inverted_dropout_semantics():
    """Zeros appear at ~rate frequency; survivors are scaled by 1/keep."""
    drop = make_dropout(jax.random.PRNGKey(42), 0.5)
    x = jnp.ones((256, 256), jnp.float32)
    y = np.asarray(drop(x))
    kept = y != 0.0
    # survivors carry exactly 1/keep
    np.testing.assert_allclose(y[kept], 2.0, rtol=1e-6)
    # keep frequency ~ 0.5 (binomial, 65536 draws -> sigma ~ 0.002)
    assert abs(kept.mean() - 0.5) < 0.02
    # E[y] ~ E[x]: inverted dropout preserves expectation
    assert abs(y.mean() - 1.0) < 0.05


def test_each_call_resamples():
    """One closure == one nn.Dropout module: every invocation draws a fresh
    mask (torch resamples per forward call)."""
    drop = make_dropout(jax.random.PRNGKey(7), 0.5)
    x = jnp.ones((64, 64))
    a, b = np.asarray(drop(x)), np.asarray(drop(x))
    assert (a != b).any()


def test_masks_deterministic_in_rng():
    """Same rng -> same masks (jax.checkpoint remat replays identical bits)."""
    x = jnp.ones((32, 32))
    a = np.asarray(make_dropout(jax.random.PRNGKey(3), 0.3)(x))
    b = np.asarray(make_dropout(jax.random.PRNGKey(3), 0.3)(x))
    np.testing.assert_array_equal(a, b)


def test_dropout_preserves_dtype():
    drop = make_dropout(jax.random.PRNGKey(0), 0.25)
    x = jnp.ones((8, 8), jnp.bfloat16)
    assert drop(x).dtype == jnp.bfloat16


# ----------------------------------------------------------------- model level
@pytest.fixture(
    params=["baseline_attention", "adaptive_attention", "rnn_attention"]
)
def variant(request):
    return request.param


def _build(tiny_cf, variant, rate):
    cf = tiny_cf.replace(atten_model_name=variant, train_dropout_rate=rate)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    return cf, model, params, state


def _batch(cf):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    captions = jnp.asarray(rng.integers(0, cf.vocab_length, (2, 6)), jnp.int32)
    return images, captions


def test_rate_zero_is_bit_identical(tiny_cf, variant):
    """train_dropout_rate=0 must reproduce the no-knob forward exactly — the
    reference's Dropout(0) is the identity."""
    cf0, m0, p0, s0 = _build(tiny_cf, variant, 0.0)
    images, captions = _batch(cf0)
    base, _, _ = m0.forward(p0, s0, images, captions, train=True)
    with_rng, _, _ = m0.forward(
        p0, s0, images, captions, train=True, dropout_rng=jax.random.PRNGKey(1)
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_rng))


def test_active_dropout_changes_train_scores_only(tiny_cf, variant):
    cf, model, params, state = _build(tiny_cf, variant, 0.5)
    images, captions = _batch(cf)
    plain, _, _ = model.forward(params, state, images, captions, train=True)
    dropped, _, _ = model.forward(
        params, state, images, captions, train=True,
        dropout_rng=jax.random.PRNGKey(1),
    )
    assert (np.asarray(plain) != np.asarray(dropped)).any()
    # eval forward ignores the rate entirely (train=False -> no drop closure)
    ev0, _, _ = model.forward(params, state, images, captions, train=False)
    cf0, m0, p0, s0 = _build(tiny_cf, variant, 0.0)
    ev1, _, _ = m0.forward(p0, s0, images, captions, train=False)
    np.testing.assert_array_equal(np.asarray(ev0), np.asarray(ev1))


def test_dropout_rngs_differ(tiny_cf):
    cf, model, params, state = _build(tiny_cf, "adaptive_attention", 0.5)
    images, captions = _batch(cf)
    a, _, _ = model.forward(
        params, state, images, captions, train=True,
        dropout_rng=jax.random.PRNGKey(1),
    )
    b, _, _ = model.forward(
        params, state, images, captions, train=True,
        dropout_rng=jax.random.PRNGKey(2),
    )
    assert (np.asarray(a) != np.asarray(b)).any()


def test_remat_encoder_matches_with_dropout(tiny_cf):
    """jax.checkpoint over the encoder must replay identical dropout bits —
    the masks are a pure function of the step rng, not of trace order."""
    cf, model, params, state = _build(tiny_cf, "adaptive_attention", 0.5)
    model_r = model._replace(remat_encoder=True)
    images, captions = _batch(cf)
    rng = jax.random.PRNGKey(5)

    va, ga = jax.value_and_grad(lambda p: _loss_p(model, p, state, images, captions, rng))(params)
    vb, gb = jax.value_and_grad(lambda p: _loss_p(model_r, p, state, images, captions, rng))(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    la = jax.tree.leaves(ga)
    lb = jax.tree.leaves(gb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)


def _loss_p(m, p, state, images, captions, rng):
    s, _, _ = m.forward(p, state, images, captions, train=True, dropout_rng=rng)
    return jnp.sum(s * s)


# ------------------------------------------------------------------ step level
def test_train_step_with_dropout(tiny_cf):
    """Full jitted train step runs with dropout on; loss is finite and params
    move. Also: rate=0 step output is unchanged by the knob (split is gated)."""
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = tiny_cf.replace(train_dropout_rate=0.5)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    dual, opt_state = make_dual_optimizer(params, cf)
    step = make_train_step(model, dual, cf)

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, (2, 72, 72, 3), dtype=np.uint8)
        ),
        "captions": jnp.asarray(rng.integers(0, cf.vocab_length, (2, 6)), jnp.int32),
        "lengths": jnp.asarray([6, 4], jnp.int32),
    }
    before = [np.asarray(x) for x in jax.tree.leaves(params)]
    out = step(
        jax.tree.map(jnp.copy, params), state, opt_state, batch,
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(out.loss))
    moved = any(
        (a != np.asarray(b)).any()
        for a, b in zip(before, jax.tree.leaves(out.params))
    )
    assert moved


def test_config_rejects_bad_dropout_rate():
    from adaptive_tpu.config import load_config

    with pytest.raises(ValueError, match="train_dropout_rate"):
        load_config(None, train_dropout_rate=1.0)
    with pytest.raises(ValueError, match="train_dropout_rate"):
        load_config(None, train_dropout_rate=-0.5)
    load_config(None, train_dropout_rate=0.5)  # valid
