"""Beam-search score integrity: every returned beam's score must equal an
independent per-token rescoring of its returned token path.

This is the test that catches state-reorder bugs in the beam's source-beam
gather (decoding/beam.py::gather_beams and the ids/att/beta history reorders):
if any per-beam state (LSTM h/c, sentinel input, history buffers) is gathered
with the wrong index, the reported path and its reported score silently
diverge — per-path rescoring pins them together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.decoding import make_beam_decoder
from adaptive_tpu.models.factory import build_model
from adaptive_tpu.ops.preprocess import eval_preprocess


@pytest.fixture(scope="module")
def setup(tiny_cf):
    cf = tiny_cf
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    images = np.random.default_rng(0).integers(0, 255, (2, 72, 72, 3), dtype=np.uint8)
    return cf, model, params, state, images


def _rescore_paths(cf, model, params, state, images, ids):
    """Teacher-force each [B, W, L] token path through the raw (unprepared)
    decode step; returns summed log-probs [B, W] with the beam's freezing
    semantics (tokens after the first <end> cost 0)."""
    B, W, L = ids.shape
    x = eval_preprocess(jnp.asarray(images), cf.train_crop_size)
    V, v_g, h0, c0, _ = model.encode(params, state, x)
    totals = np.zeros((B, W))
    for w in range(W):
        dstate = model.init_decode_state(h0, c0)
        tok = jnp.full((B,), cf.decode_start_token, jnp.int32)
        done = np.zeros(B, bool)
        for t in range(L):
            logits, _, _, dstate = model.decode_step(
                params, tok, v_g, dstate, V, cf.sampler_sentinel_uses_prev_hidden
            )
            lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
            nxt = ids[:, w, t]
            totals[:, w] += np.where(done, 0.0, lp[np.arange(B), nxt])
            done |= nxt == cf.decode_eos_token
            tok = jnp.asarray(nxt)
    return totals


def test_beam_all_scores_match_independent_rescoring(setup):
    cf, model, params, state, images = setup
    beam = make_beam_decoder(model, cf, beam_size=3)
    out = beam(params, state, images)
    ids = np.asarray(out.all_ids)
    got = np.asarray(out.all_scores)
    want = _rescore_paths(cf, model, params, state, images, ids)
    # cross-program fp noise only: the beam program (prepared weights, fused
    # encoder) and this raw rescoring differ by ULP-level logit shifts that
    # accumulate over <=L log_softmax terms.
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_beam_winner_consistent_with_all_beams(setup):
    cf, model, params, state, images = setup
    beam = make_beam_decoder(model, cf, beam_size=3)
    out = beam(params, state, images)
    best = np.asarray(out.all_scores).argmax(axis=1)
    np.testing.assert_array_equal(
        np.asarray(out.ids),
        np.asarray(out.all_ids)[np.arange(len(best)), best],
    )
    np.testing.assert_allclose(
        np.asarray(out.score),
        np.asarray(out.all_scores)[np.arange(len(best)), best],
        rtol=1e-6,
    )


def test_beam_length_normalization_orders_by_normalized_score(setup):
    """length_alpha > 0 must rank by score/len^alpha and report the
    normalized value, with lengths counted through the first <end>."""
    cf, model, params, state, images = setup
    out = make_beam_decoder(model, cf, beam_size=3, length_alpha=0.7)(
        params, state, images
    )
    raw = _rescore_paths(
        cf, model, params, state, images, np.asarray(out.all_ids)
    )
    ids = np.asarray(out.all_ids)
    eos_hit = ids == cf.decode_eos_token
    lengths = np.where(
        eos_hit.any(-1), eos_hit.argmax(-1) + 1, ids.shape[-1] + 1
    ).astype(np.float64)
    want = raw / lengths**0.7
    np.testing.assert_allclose(np.asarray(out.all_scores), want, atol=5e-3, rtol=0)
    assert (
        np.asarray(out.score)
        >= np.asarray(out.all_scores).max(axis=1) - 1e-6
    ).all()
