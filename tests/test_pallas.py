"""Pallas fused decode-step kernel vs. the jnp reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.ops import attention as att
@pytest.mark.parametrize("B,K,H,E2", [(3, 4, 16, 8), (8, 49, 32, 12)])
def test_fused_decode_cell_matches_jnp(B, K, H, E2):
    """The v2 kernel (LSTM cell + sentinel + attention, SURVEY §7 step 6)
    must equal lstm_cell + the jnp attention path."""
    from adaptive_tpu.ops.lstm import lstm_cell
    from adaptive_tpu.ops.pallas.fused_step import adaptive_decode_cell_fused

    rng = np.random.default_rng(2)
    D = K
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    atten = {
        "affine_v": {"kernel": f(H, D)},
        "affine_g": {"kernel": f(H, D)},
        "affine_s": {"kernel": f(H, D)},
        "affine_h": {"kernel": f(D, 1)},
    }
    sentinel = {"affine_x": {"kernel": f(E2, H)}, "affine_h": {"kernel": f(H, H)}}
    lstm = {
        "w_ih": f(E2, 4 * H), "w_hh": f(H, 4 * H) * 0.2,
        "b_ih": f(4 * H) * 0.1, "b_hh": f(4 * H) * 0.1,
    }
    x, h_in, c_in, hp = f(B, E2), f(B, H), f(B, H), f(B, H)
    V = f(B, K, H)
    pv = att.precompute_slots(atten, V)

    want_h, (_, want_c) = lstm_cell(lstm, x, (h_in, c_in))
    s = att.sentinel_gate(sentinel, x[:, None], hp[:, None], want_c[:, None])
    want_chat, want_alpha, want_beta = att.adaptive_attention(atten, V, want_h[:, None], s, pv)

    got_h, got_c, got_chat, got_alpha, got_beta = adaptive_decode_cell_fused(
        lstm, atten, sentinel, x, h_in, c_in, hp, V, pv, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_chat), np.asarray(want_chat[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_alpha), np.asarray(want_alpha[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_beta), np.asarray(want_beta[:, 0]), atol=1e-5)


def test_fused_decode_cell_prepadded_slots_match(tiny_cf):
    """pad_decode_slots + real_k (the decode scans' hoisted-pad path) must
    yield bit-identical outputs to passing the unpadded V/pv."""
    from adaptive_tpu.ops.pallas.fused_step import (
        adaptive_decode_cell_fused, pad_decode_slots,
    )

    rng = np.random.default_rng(3)
    B, K, H, E2 = 5, 49, 32, 12
    D = K
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    atten = {
        "affine_v": {"kernel": f(H, D)},
        "affine_g": {"kernel": f(H, D)},
        "affine_s": {"kernel": f(H, D)},
        "affine_h": {"kernel": f(D, 1)},
    }
    sentinel = {"affine_x": {"kernel": f(E2, H)}, "affine_h": {"kernel": f(H, H)}}
    lstm = {
        "w_ih": f(E2, 4 * H), "w_hh": f(H, 4 * H) * 0.2,
        "b_ih": f(4 * H) * 0.1, "b_hh": f(4 * H) * 0.1,
    }
    x, h_in, c_in, hp = f(B, E2), f(B, H), f(B, H), f(B, H)
    V = f(B, K, H)
    pv = att.precompute_slots(atten, V)

    plain = adaptive_decode_cell_fused(
        lstm, atten, sentinel, x, h_in, c_in, hp, V, pv, interpret=True
    )
    Vp, pvp = pad_decode_slots(V, pv)
    # B=5 also pads to the 8-row sublane on the image axis (the batch pad is
    # hoisted out of the decode scan too — in-loop pads of loop-invariant
    # operands re-materialize every step)
    assert Vp.shape == (8, 64, H) and pvp.shape == (8, 64, 64)
    padded = adaptive_decode_cell_fused(
        lstm, atten, sentinel, x, h_in, c_in, hp, Vp, pvp, real_k=K, interpret=True
    )
    for name, a, b in zip(("h", "c", "chat", "alpha", "beta"), padded, plain):
        assert a.shape == b.shape, name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)

    # beam-major: W=3 at 5 images -> 15 rows -> 48-row block; image axis
    # pre-pads to 16 shared V/pv rows while x/h stay at the real 15
    W = 3
    rep = lambda a: jnp.repeat(a, W, axis=0)
    xw, hw, cw, hpw = rep(x), rep(h_in), rep(c_in), rep(hp)
    plain_w = adaptive_decode_cell_fused(
        lstm, atten, sentinel, xw, hw, cw, hpw, V, pv, beam_w=W, interpret=True
    )
    Vw, pvw = pad_decode_slots(V, pv, beam_w=W)
    assert Vw.shape == (16, 64, H)
    padded_w = adaptive_decode_cell_fused(
        lstm, atten, sentinel, xw, hw, cw, hpw, Vw, pvw, real_k=K, beam_w=W,
        interpret=True,
    )
    for name, a, b in zip(("h", "c", "chat", "alpha", "beta"), padded_w, plain_w):
        assert a.shape == b.shape, name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_fused_decode_cell_in_decode_step(tiny_cf):
    """decode_step with use_pallas on (interpret mode) must equal the jnp
    path end-to-end — logits, attention, beta, and the carried state."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_tpu.models.factory import build_model

    cf = tiny_cf.replace(atten_model_name="adaptive_attention")
    plain = build_model(cf.replace(use_pallas="never"))
    fused = build_model(cf.replace(use_pallas="always"))
    params, state = plain.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    H = cf.adaptive_lstm_hidden_size
    K = (cf.train_crop_size // 32) ** 2
    B = 4
    V = jnp.asarray(rng.normal(size=(B, K, H)), jnp.float32)
    v_g = jnp.asarray(rng.normal(size=(B, cf.adaptive_word_embed_size)), jnp.float32)
    dstate = plain.init_decode_state(
        jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32)
    )
    tok = jnp.array([1, 2, 3, 1], jnp.int32)

    ref = plain.decode_step(params, tok, v_g, dstate, V, False)
    with pltpu.force_tpu_interpret_mode():
        got = fused.decode_step(params, tok, v_g, dstate, V, False)
    for name, a, b in zip(("logits", "alpha", "beta"), got[:3], ref[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name)
    for name, a, b in zip(("h", "c", "h_prev"), got[3], ref[3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name)


@pytest.mark.parametrize("B,H,vocab", [(4, 16, 37), (5, 32, 1500)])
def test_greedy_head_argmax_matches_jnp(B, H, vocab):
    """Fused head+argmax == argmax((chat+h) @ W + b) over the real vocab
    (padding columns never win)."""
    from adaptive_tpu.ops.pallas.fused_step import greedy_head_argmax

    rng = np.random.default_rng(5)
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    w, b = f(H, vocab), f(vocab)
    chat, h = f(B, H), f(B, H)
    want = np.asarray(jnp.argmax((chat + h) @ w + b, axis=-1))

    target = -(-vocab // 128) * 128
    if target > 1280:
        target = -(-target // 1280) * 1280
    wp = jnp.pad(w, ((0, 0), (0, target - vocab)))
    bp = jnp.pad(b, (0, target - vocab))
    got = np.asarray(greedy_head_argmax(wp, bp, chat, h, vocab, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("B,H,vocab,W", [(4, 16, 37, 3), (5, 32, 1500, 5), (3, 16, 200, 1)])
def test_beam_head_topk_matches_jnp(B, H, vocab, W):
    """Fused head+top-W+logsumexp == lax.top_k(log_softmax(logits)) over the
    real vocab: same values, same indices (incl. tie order), same normalizer."""
    from adaptive_tpu.ops.pallas.fused_step import beam_head_topk

    rng = np.random.default_rng(11)
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    w, b = f(H, vocab), f(vocab)
    chat, h = f(B, H), f(B, H)
    logits = (chat + h) @ w + b
    logp = jax.nn.log_softmax(logits, axis=-1)
    want_v, want_i = jax.lax.top_k(logp, W)

    target = -(-vocab // 128) * 128
    if target > 1280:
        target = -(-target // 1280) * 1280
    wp = jnp.pad(w, ((0, 0), (0, target - vocab)))
    bp = jnp.pad(b, (0, target - vocab))
    topv, topi, lse = beam_head_topk(wp, bp, chat, h, vocab, W, interpret=True)
    np.testing.assert_array_equal(np.asarray(topi), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(topv - lse), np.asarray(want_v), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lse[:, 0]),
        np.asarray(jax.scipy.special.logsumexp(logits, axis=-1)),
        atol=2e-5,
    )


def test_beam_head_topk_tie_order():
    """Equal logits rank by ascending vocab index, matching lax.top_k."""
    from adaptive_tpu.ops.pallas.fused_step import beam_head_topk

    H, vocab, W = 8, 64, 4
    # (chat+h) @ w with w columns equal in pairs -> exactly tied logits
    w = jnp.zeros((H, vocab), jnp.float32)
    w = w.at[0, 10].set(2.0).at[0, 40].set(2.0)  # tie at value 2
    w = w.at[0, 5].set(3.0)
    b = jnp.zeros((vocab,), jnp.float32)
    chat = jnp.ones((2, H), jnp.float32) * 0.5
    h = jnp.ones((2, H), jnp.float32) * 0.5
    wp = jnp.pad(w, ((0, 0), (0, 128 - vocab)))
    bp = jnp.pad(b, (0, 128 - vocab))
    _, topi, _ = beam_head_topk(wp, bp, chat, h, vocab, W, interpret=True)
    np.testing.assert_array_equal(np.asarray(topi[0, :3]), [5, 10, 40])


def test_beam_decode_step_fused_matches_plain(tiny_cf):
    """model.beam_decode_step with the fused head must return the same top-k
    tokens and normalized log-probs as the XLA fallback (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_tpu.models.factory import build_model

    cf = tiny_cf.replace(atten_model_name="adaptive_attention")
    plain = build_model(cf.replace(use_pallas="never"))
    fused = build_model(cf.replace(use_pallas="always"))
    params, state = plain.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(9)
    H = cf.adaptive_lstm_hidden_size
    K = (cf.train_crop_size // 32) ** 2
    B, W = 4, 3
    V = jnp.asarray(rng.normal(size=(B, K, H)), jnp.float32)
    v_g = jnp.asarray(rng.normal(size=(B, cf.adaptive_word_embed_size)), jnp.float32)
    dstate = plain.init_decode_state(
        jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32)
    )
    tok = jnp.array([1, 2, 3, 1], jnp.int32)

    ref = plain.beam_decode_step(params, tok, v_g, dstate, V, W, head=None)
    with pltpu.force_tpu_interpret_mode():
        head = fused.prepare_greedy_head(params)
        got = fused.beam_decode_step(params, tok, v_g, dstate, V, W, head=head)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), atol=2e-4)


@pytest.mark.parametrize("W", [2, 3, 5])
def test_fused_decode_cell_beam_major_matches_tiled(W):
    """beam_w > 1 (untiled V/pv, one slot stream shared by the W batch-major
    beam rows of each image) must equal the dense beam_w=1 layout fed the
    jnp.repeat-tiled V/pv."""
    from adaptive_tpu.ops.pallas.fused_step import (
        adaptive_decode_cell_fused, pad_decode_slots,
    )

    rng = np.random.default_rng(11)
    B, K, H, E2 = 3, 49, 32, 12
    R = B * W
    D = K
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    atten = {
        "affine_v": {"kernel": f(H, D)},
        "affine_g": {"kernel": f(H, D)},
        "affine_s": {"kernel": f(H, D)},
        "affine_h": {"kernel": f(D, 1)},
    }
    sentinel = {"affine_x": {"kernel": f(E2, H)}, "affine_h": {"kernel": f(H, H)}}
    lstm = {
        "w_ih": f(E2, 4 * H), "w_hh": f(H, 4 * H) * 0.2,
        "b_ih": f(4 * H) * 0.1, "b_hh": f(4 * H) * 0.1,
    }
    # per-ROW states differ (each beam carries its own h/c); V/pv per image
    x, h_in, c_in, hp = f(R, E2), f(R, H), f(R, H), f(R, H)
    V = f(B, K, H)
    pv = att.precompute_slots(atten, V)

    V_rep, pv_rep = jnp.repeat(V, W, axis=0), jnp.repeat(pv, W, axis=0)
    want = adaptive_decode_cell_fused(
        lstm, atten, sentinel, x, h_in, c_in, hp, V_rep, pv_rep, interpret=True
    )
    # pre-pad for the layout the cell will run (slot axes AND the image axis
    # to the beam-major row block — beam.py passes beam_w the same way)
    Vp, pvp = pad_decode_slots(V, pv, beam_w=W)
    got = adaptive_decode_cell_fused(
        lstm, atten, sentinel, x, h_in, c_in, hp, Vp, pvp, real_k=K,
        beam_w=W, interpret=True,
    )
    for name, a, b in zip(("h", "c", "chat", "alpha", "beta"), got, want):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )


def test_fused_decode_cell_beam_major_bad_rows():
    """Row count must equal B * beam_w — a tiled-V mistake fails loudly."""
    from adaptive_tpu.ops.pallas.fused_step import adaptive_decode_cell_fused

    f = lambda *s: jnp.zeros(s, jnp.float32)
    atten = {k: {"kernel": f(8, 8)} for k in ("affine_v", "affine_g", "affine_s")}
    atten["affine_h"] = {"kernel": f(8, 1)}
    sentinel = {"affine_x": {"kernel": f(4, 8)}, "affine_h": {"kernel": f(8, 8)}}
    lstm = {"w_ih": f(4, 32), "w_hh": f(8, 32), "b_ih": f(32), "b_hh": f(32)}
    with pytest.raises(ValueError, match="beam-major"):
        adaptive_decode_cell_fused(
            lstm, atten, sentinel, f(5, 4), f(5, 8), f(5, 8), f(5, 8),
            f(2, 8, 8), f(2, 8, 8), beam_w=3, interpret=True,
        )


def test_beam_decode_step_beam_major_matches_plain(tiny_cf):
    """model.beam_decode_step with beam_w=W (untiled V/pv) must match the XLA
    fallback fed per-row states — the production beam layout end-to-end."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_tpu.models.factory import build_model

    cf = tiny_cf.replace(atten_model_name="adaptive_attention")
    plain = build_model(cf.replace(use_pallas="never"))
    fused = build_model(cf.replace(use_pallas="always"))
    params, state = plain.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(13)
    H = cf.adaptive_lstm_hidden_size
    K = (cf.train_crop_size // 32) ** 2
    B, W = 2, 3
    R = B * W
    V = jnp.asarray(rng.normal(size=(B, K, H)), jnp.float32)
    v_g = jnp.asarray(rng.normal(size=(R, cf.adaptive_word_embed_size)), jnp.float32)
    dstate = plain.init_decode_state(
        jnp.asarray(rng.normal(size=(R, H)), jnp.float32),
        jnp.asarray(rng.normal(size=(R, H)), jnp.float32),
    )
    tok = jnp.asarray(rng.integers(0, cf.vocab_length, R), jnp.int32)

    # fallback with beam_w: repeats V internally (per-row slots)
    ref = plain.beam_decode_step(params, tok, v_g, dstate, V, W, head=None, beam_w=W)
    with pltpu.force_tpu_interpret_mode():
        head = fused.prepare_greedy_head(params)
        got = fused.beam_decode_step(params, tok, v_g, dstate, V, W, head=head, beam_w=W)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[3]), np.asarray(ref[3]), atol=2e-4)
    for a, b in zip(got[4], ref[4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_beam_decoder_fused_matches_plain(tiny_cf):
    """make_beam_decoder end-to-end: the fused beam-major program (interpret
    mode) must pick the same captions and scores as the XLA fallback."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_tpu.decoding import make_beam_decoder
    from adaptive_tpu.models.factory import build_model

    cf = tiny_cf.replace(atten_model_name="adaptive_attention", decode_max_len=5)
    plain = build_model(cf.replace(use_pallas="never"))
    fused = build_model(cf.replace(use_pallas="always"))
    params, state = plain.init(jax.random.PRNGKey(2))
    imgs = np.random.default_rng(5).integers(
        0, 255, (3, cf.train_crop_size, cf.train_crop_size, 3), dtype=np.uint8
    )

    ref = make_beam_decoder(plain, cf, beam_size=3)(params, state, imgs)
    with pltpu.force_tpu_interpret_mode():
        got = make_beam_decoder(fused, cf, beam_size=3)(params, state, imgs)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    np.testing.assert_array_equal(np.asarray(got.all_ids), np.asarray(ref.all_ids))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(ref.score), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got.attention), np.asarray(ref.attention), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(got.beta), np.asarray(ref.beta), atol=2e-3)


def test_beam_major_supported_widths():
    """lcm(8, W) past the proven 64-row VMEM block is refused loudly by the
    cell; beam_major_supported is the gate callers must use."""
    from adaptive_tpu.ops.pallas.fused_step import (
        adaptive_decode_cell_fused, beam_major_supported,
    )

    assert all(beam_major_supported(w) for w in (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16))
    assert not any(beam_major_supported(w) for w in (9, 11, 13))

    f = lambda *s: jnp.zeros(s, jnp.float32)
    atten = {k: {"kernel": f(8, 8)} for k in ("affine_v", "affine_g", "affine_s")}
    atten["affine_h"] = {"kernel": f(8, 1)}
    sentinel = {"affine_x": {"kernel": f(4, 8)}, "affine_h": {"kernel": f(8, 8)}}
    lstm = {"w_ih": f(4, 32), "w_hh": f(8, 32), "b_ih": f(32), "b_hh": f(32)}
    with pytest.raises(ValueError, match="VMEM budget"):
        adaptive_decode_cell_fused(
            lstm, atten, sentinel, f(18, 4), f(18, 8), f(18, 8), f(18, 8),
            f(2, 8, 8), f(2, 8, 8), beam_w=9, interpret=True,
        )


def test_beam_decoder_beam_major_escape_hatch(tiny_cf):
    """decode_beam_major=False (the tiled-layout escape hatch) must produce
    bit-identical captions/scores to the default beam-major program, and an
    unsupported width must auto-fall back to tiled instead of raising."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_tpu.decoding import make_beam_decoder
    from adaptive_tpu.models.factory import build_model

    cf = tiny_cf.replace(atten_model_name="adaptive_attention", decode_max_len=4)
    fused = build_model(cf.replace(use_pallas="always"))
    params, state = fused.init(jax.random.PRNGKey(2))
    imgs = np.random.default_rng(5).integers(
        0, 255, (3, cf.train_crop_size, cf.train_crop_size, 3), dtype=np.uint8
    )

    with pltpu.force_tpu_interpret_mode():
        major = make_beam_decoder(fused, cf, beam_size=3)(params, state, imgs)
        tiled = make_beam_decoder(
            fused, cf.replace(decode_beam_major=False), beam_size=3
        )(params, state, imgs)
        # width 9: lcm(8,9)=72 > 64 — silently routed to the tiled layout
        w9 = make_beam_decoder(fused, cf, beam_size=9)(params, state, imgs)
    np.testing.assert_array_equal(np.asarray(tiled.all_ids), np.asarray(major.all_ids))
    np.testing.assert_allclose(
        np.asarray(tiled.all_scores), np.asarray(major.all_scores), atol=1e-5
    )
    assert w9.all_ids.shape == (3, 9, 4)


def test_greedy_decode_step_fused_matches_plain(tiny_cf):
    """model.greedy_decode_step with the fused head must pick the same tokens
    as the plain logits+argmax path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_tpu.models.factory import build_model

    cf = tiny_cf.replace(atten_model_name="adaptive_attention")
    plain = build_model(cf.replace(use_pallas="never"))
    fused = build_model(cf.replace(use_pallas="always"))
    params, state = plain.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(7)
    H = cf.adaptive_lstm_hidden_size
    K = (cf.train_crop_size // 32) ** 2
    B = 4
    V = jnp.asarray(rng.normal(size=(B, K, H)), jnp.float32)
    v_g = jnp.asarray(rng.normal(size=(B, cf.adaptive_word_embed_size)), jnp.float32)
    dstate = plain.init_decode_state(
        jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32)
    )
    tok = jnp.array([1, 2, 3, 1], jnp.int32)

    ref = plain.greedy_decode_step(params, tok, v_g, dstate, V, head=None)
    with pltpu.force_tpu_interpret_mode():
        head = fused.prepare_greedy_head(params)
        assert head is not None
        got = fused.greedy_decode_step(params, tok, v_g, dstate, V, head=head)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=2e-4)


# ---------------------------------------------------------------- fused block

def _ref_identity_block(p, y_s8, s_in, s2, s3, s_out):
    """The XLA int8-carry segment for one identity bottleneck block,
    op-for-op (models/infer.py::_resnet_int8_carry body)."""
    from adaptive_tpu.models import infer as I

    acc, csc = I._acc_i8(y_s8, p["conv1"]["kernel"], s_in, 1)
    z = jax.nn.relu(acc.astype(jnp.float32) * csc[None, None, None, :] + p["conv1"]["bias"])
    acc, csc = I._acc_i8(I._requant(z, s2), p["conv2"]["kernel"], s2, 1)
    z = jax.nn.relu(acc.astype(jnp.float32) * csc[None, None, None, :] + p["conv2"]["bias"])
    acc, csc = I._acc_i8(I._requant(z, s3), p["conv3"]["kernel"], s3)
    tail = acc.astype(jnp.float32) * csc[None, None, None, :] + p["conv3"]["bias"]
    out = jax.nn.relu(tail + y_s8.astype(jnp.float32) * s_in)
    return I._requant(out, s_out)


@pytest.mark.parametrize("B,W,C,M", [(2, 8, 16, 8), (4, 4, 24, 8), (8, 4, 64, 32)])
def test_fused_block_bit_parity(B, W, C, M):
    from adaptive_tpu.models import infer as I

    rng = np.random.default_rng(0)
    p = {
        f"conv{i}": {
            "kernel": jnp.asarray(rng.normal(0, 0.4, shp), jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 0.2, shp[-1]), jnp.float32),
        }
        for i, shp in ((1, (1, 1, C, M)), (2, (3, 3, M, M)), (3, (1, 1, M, C)))
    }
    y_s8 = jnp.asarray(rng.integers(-127, 128, (B, W, W, C)), jnp.int8)
    s_in, s2, s3, s_out = 0.021, 0.034, 0.057, 0.026

    want = np.asarray(_ref_identity_block(p, y_s8, s_in, s2, s3, s_out), np.int32)
    got = np.asarray(I._fused_identity_block(p, y_s8, s_in, s2, s3, s_out,
                                             interpret=True), np.int32)
    # integer conv accumulation is exact; the f32 epilogues may differ by one
    # ULP between the two lowerings (FMA contraction), flipping requant
    # round-to-nearest ties by +/-1 quantum on rare elements (measured
    # 1/131072 on real weights). Anything beyond that is a real bug.
    d = np.abs(got - want)
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 2e-3, (d != 0).mean()


@pytest.mark.slow
def test_fused_block_carry_integration():
    """Full int8-carry forward with fused_layers on ~= off; layers whose
    grouping can't align (pick_group=0) silently fall back. Tolerance covers
    +/-1-quantum requant ties amplified through later blocks (the quality
    gates in tests/test_int8.py bound the end-to-end effect)."""
    from adaptive_tpu.models import encoder as E
    from adaptive_tpu.models import infer as I

    B, crop = 8, 64
    params, state = E.init_encoder(jax.random.PRNGKey(0), 8, 16, "resnet50")
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(0, 1, (B, crop, crop, 3)), jnp.float32)
    folded = I.fold_resnet(params["resnet"], state["resnet"], "resnet50")
    scales = I.calibrate_int8(params, state, imgs, "resnet50")

    base = I.resnet_apply_folded_int8(folded, imgs, "resnet50", scales)
    fused = I.resnet_apply_folded_int8(
        folded, imgs, "resnet50", scales,
        fused_layers=("layer1", "layer2", "layer3", "layer4"), interpret=True,
    )
    b, f = np.asarray(base, np.float64), np.asarray(fused, np.float64)
    scale = np.abs(b).max()
    assert np.abs(f - b).max() < 0.05 * scale
    cos = (b * f).sum() / (np.linalg.norm(b) * np.linalg.norm(f))
    assert cos > 0.9999, cos


def test_fused_block_pick_group():
    from adaptive_tpu.ops.pallas.fused_block import pick_group

    assert pick_group(1024, 56 * 56) == 1      # layer1: already aligned
    assert pick_group(1024, 28 * 28) == 2      # layer2: 2*784 = 49*32
    assert pick_group(1024, 14 * 14) == 8      # layer3
    assert pick_group(1024, 7 * 7) == 32       # layer4
    assert pick_group(2, 4) == 0               # no aligned grouping fits B


# ----------------------------------------------------------------- fused tail

@pytest.mark.parametrize("B,W,C,M,M2", [(2, 4, 16, 8, 8), (4, 4, 32, 16, 24)])
def test_fused_tail_bit_parity(B, W, C, M, M2):
    """tail_conv1_int8 == the XLA carry segment it replaces, stage by stage.

    Stage 1 (conv3+residual+requant carry) is compared against the XLA ops
    directly (+/-1-quantum ties, as for the fused block). Stage 2 (next
    conv1) is compared against XLA *fed the kernel's own carry* so a tie
    flip in stage 1 doesn't amplify through the int accumulation and mask a
    real stage-2 bug."""
    from adaptive_tpu.models import infer as I

    rng = np.random.default_rng(2)
    p = {"conv3": {
        "kernel": jnp.asarray(rng.normal(0, 0.4, (1, 1, M, C)), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 0.2, C), jnp.float32),
    }}
    next_p = {"conv1": {
        "kernel": jnp.asarray(rng.normal(0, 0.4, (1, 1, C, M2)), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 0.2, M2), jnp.float32),
    }}
    y_s8 = jnp.asarray(rng.integers(-127, 128, (B, W, W, C)), jnp.int8)
    z2f = jnp.asarray(np.abs(rng.normal(0, 1.5, (B, W, W, M))), jnp.float32)
    s3, s_in, s_out, s_next = 0.031, 0.024, 0.027, 0.042

    got_out, got_z1 = I._fused_tail_pair(
        p, next_p, y_s8, z2f, s3, s_in, s_out, s_next, interpret=True)

    acc, csc = I._acc_i8(I._requant(z2f, s3), p["conv3"]["kernel"], s3)
    tail = acc.astype(jnp.float32) * csc[None, None, None, :] + p["conv3"]["bias"]
    want_out = I._requant(jax.nn.relu(tail + y_s8.astype(jnp.float32) * s_in), s_out)
    d = np.abs(np.asarray(got_out, np.int32) - np.asarray(want_out, np.int32))
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 2e-3, (d != 0).mean()

    acc, csc = I._acc_i8(got_out, next_p["conv1"]["kernel"], s_out, 1)
    z1 = jax.nn.relu(acc.astype(jnp.float32) * csc[None, None, None, :]
                     + next_p["conv1"]["bias"])
    want_z1 = I._requant(z1, s_next)
    d = np.abs(np.asarray(got_z1, np.int32) - np.asarray(want_z1, np.int32))
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 2e-3, (d != 0).mean()


def test_fused_tail_carry_integration():
    """Full int8-carry forward with fused_tails on ~= off — exercises the
    z1_pending hand-off across every eligible boundary, including the
    cross-layer hand-off into a downsample block."""
    from adaptive_tpu.models import encoder as E
    from adaptive_tpu.models import infer as I

    B, crop = 8, 64
    params, state = E.init_encoder(jax.random.PRNGKey(0), 8, 16, "resnet50")
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(0, 1, (B, crop, crop, 3)), jnp.float32)
    folded = I.fold_resnet(params["resnet"], state["resnet"], "resnet50")
    scales = I.calibrate_int8(params, state, imgs, "resnet50")

    base = I.resnet_apply_folded_int8(folded, imgs, "resnet50", scales)
    fused = I.resnet_apply_folded_int8(
        folded, imgs, "resnet50", scales,
        fused_tails=("layer1", "layer2", "layer3", "layer4"), interpret=True,
    )
    b, f = np.asarray(base, np.float64), np.asarray(fused, np.float64)
    scale = np.abs(b).max()
    assert np.abs(f - b).max() < 0.05 * scale
    cos = (b * f).sum() / (np.linalg.norm(b) * np.linalg.norm(f))
    assert cos > 0.9999, cos


def test_fused_tail_overlap_rejected():
    from adaptive_tpu.models import infer as I

    with pytest.raises(ValueError, match="fused_tails"):
        I.resnet_apply_folded_int8(
            {}, jnp.zeros((1, 8, 8, 3)), "resnet50", {"conv1": 1.0},
            fused_layers=("layer2",), fused_tails=("layer2", "layer3"),
        )
