"""Numerical parity of core ops vs. independent PyTorch oracles.

These tests re-express the reference math with torch primitives (not copied
code) and check the JAX implementations match in fp32.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adaptive_tpu.ops import attention as att  # noqa: E402
from adaptive_tpu.ops import inits  # noqa: E402
from adaptive_tpu.ops.lstm import lstm_cell, lstm_scan  # noqa: E402

B, T, K, H, E2 = 3, 4, 5, 8, 6  # batch, time, slots, hidden, 2*embed
ATOL = 1e-5


def _lin(key, i, o, bias=False):
    p = {"kernel": jnp.asarray(np.random.default_rng(key).normal(size=(i, o)), jnp.float32)}
    if bias:
        p["bias"] = jnp.asarray(np.random.default_rng(key + 1).normal(size=(o,)), jnp.float32)
    return p


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


# ------------------------------------------------------------------ LSTM cell
def test_lstm_cell_matches_torch():
    rng = np.random.default_rng(0)
    I = E2
    w_ih = rng.normal(size=(4 * H, I)).astype(np.float32)
    w_hh = rng.normal(size=(4 * H, H)).astype(np.float32)
    b_ih = rng.normal(size=(4 * H,)).astype(np.float32)
    b_hh = rng.normal(size=(4 * H,)).astype(np.float32)
    x = rng.normal(size=(B, I)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    c0 = rng.normal(size=(B, H)).astype(np.float32)

    cell = torch.nn.LSTMCell(I, H)
    with torch.no_grad():
        cell.weight_ih.copy_(_t(w_ih))
        cell.weight_hh.copy_(_t(w_hh))
        cell.bias_ih.copy_(_t(b_ih))
        cell.bias_hh.copy_(_t(b_hh))
        th, tc = cell(_t(x), (_t(h0), _t(c0)))

    params = {"w_ih": jnp.asarray(w_ih.T), "w_hh": jnp.asarray(w_hh.T),
              "b_ih": jnp.asarray(b_ih), "b_hh": jnp.asarray(b_hh)}
    jh, (jh2, jc) = lstm_cell(params, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=ATOL)


def test_lstm_scan_matches_torch_lstm():
    rng = np.random.default_rng(1)
    I = E2
    lstm = torch.nn.LSTM(I, H, 1, batch_first=True)
    xs = rng.normal(size=(B, T, I)).astype(np.float32)
    h0 = rng.normal(size=(1, B, H)).astype(np.float32)
    c0 = rng.normal(size=(1, B, H)).astype(np.float32)
    with torch.no_grad():
        out, (hn, cn) = lstm(_t(xs), (_t(h0), _t(c0)))

    params = {
        "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
    }
    hs, cs, (hT, cT) = lstm_scan(params, jnp.asarray(xs), (jnp.asarray(h0[0]), jnp.asarray(c0[0])))
    np.testing.assert_allclose(np.asarray(hs), out.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(hT), hn[0].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(cT), cn[0].numpy(), atol=ATOL)


# ------------------------------------------------------- spatial attention
def _torch_spatial(V, h, Wv, Wg, wh):
    # independent torch re-expression of baseline_attention.py:86-96
    pv = V @ Wv.T  # [B,K,D]
    ph = h @ Wg.T  # [B,T,D]
    content = torch.tanh(pv.unsqueeze(1) + ph.unsqueeze(2))  # [B,T,K,D]
    z = (content @ wh.T).squeeze(-1)  # [B,T,K]
    alpha = torch.softmax(z, dim=-1)
    c = alpha @ V
    return c, alpha, z


def test_spatial_attention_matches_torch():
    rng = np.random.default_rng(2)
    D = K  # reference ties proj dim to slot count
    V = rng.normal(size=(B, K, H)).astype(np.float32)
    h = rng.normal(size=(B, T, H)).astype(np.float32)
    Wv = rng.normal(size=(D, H)).astype(np.float32)
    Wg = rng.normal(size=(D, H)).astype(np.float32)
    wh = rng.normal(size=(1, D)).astype(np.float32)

    tc, ta, _ = _torch_spatial(_t(V), _t(h), _t(Wv), _t(Wg), _t(wh))
    params = {
        "affine_v": {"kernel": jnp.asarray(Wv.T)},
        "affine_g": {"kernel": jnp.asarray(Wg.T)},
        "affine_h": {"kernel": jnp.asarray(wh.T)},
    }
    jc, ja = att.spatial_attention(params, jnp.asarray(V), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=ATOL)


# ------------------------------------------------- adaptive attention + beta
def test_adaptive_attention_matches_torch():
    rng = np.random.default_rng(3)
    D = K
    V = rng.normal(size=(B, K, H)).astype(np.float32)
    h = rng.normal(size=(B, T, H)).astype(np.float32)
    s = rng.normal(size=(B, T, H)).astype(np.float32)
    Wv, Wg, Ws = (rng.normal(size=(D, H)).astype(np.float32) for _ in range(3))
    wh = rng.normal(size=(1, D)).astype(np.float32)

    # torch oracle per adaptive_attention.py:26-58
    tV, th, ts = _t(V), _t(h), _t(s)
    _, ta, tz = _torch_spatial(tV, th, _t(Wv), _t(Wg), _t(wh))
    tc = ta @ tV
    content_s = torch.tanh(ts @ _t(Ws).T + th @ _t(Wg).T)
    z_s = content_s @ _t(wh).T
    ext = torch.cat([tz, z_s], dim=-1)
    ahat = torch.softmax(ext, dim=-1)
    tbeta = ahat[..., -1:]
    tchat = tbeta * ts + (1 - tbeta) * tc

    params = {
        "affine_v": {"kernel": jnp.asarray(Wv.T)},
        "affine_g": {"kernel": jnp.asarray(Wg.T)},
        "affine_s": {"kernel": jnp.asarray(Ws.T)},
        "affine_h": {"kernel": jnp.asarray(wh.T)},
    }
    jchat, ja, jbeta = att.adaptive_attention(params, jnp.asarray(V), jnp.asarray(h), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(jchat), tchat.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jbeta), tbeta.numpy(), atol=ATOL)


def test_sentinel_gate_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, T, E2)).astype(np.float32)
    hp = rng.normal(size=(B, T, H)).astype(np.float32)
    c = rng.normal(size=(B, T, H)).astype(np.float32)
    Wx = rng.normal(size=(H, E2)).astype(np.float32)
    Wh = rng.normal(size=(H, H)).astype(np.float32)

    tg = torch.sigmoid(_t(x) @ _t(Wx).T + _t(hp) @ _t(Wh).T)
    t_s = tg * torch.tanh(_t(c))

    params = {"affine_x": {"kernel": jnp.asarray(Wx.T)}, "affine_h": {"kernel": jnp.asarray(Wh.T)}}
    j_s = att.sentinel_gate(params, jnp.asarray(x), jnp.asarray(hp), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(j_s), t_s.numpy(), atol=ATOL)


# --------------------------------------------------------- recurrent attention
def test_recurrent_attention_matches_torch():
    rng = np.random.default_rng(5)
    D = K
    hr = H // 2
    V = rng.normal(size=(B, K, H)).astype(np.float32)
    h = rng.normal(size=(B, T, H)).astype(np.float32)
    Wv, Wg = (rng.normal(size=(D, H)).astype(np.float32) for _ in range(2))
    wh = rng.normal(size=(1, D)).astype(np.float32)

    lstm = torch.nn.LSTM(H, hr, 1, batch_first=True, bidirectional=True)

    # torch oracle per rnn_attention.py:31-67
    with torch.no_grad():
        _, ta, tz = _torch_spatial(_t(V), _t(h), _t(Wv), _t(Wg), _t(wh))
        alpha = torch.sigmoid(tz)
        Vw = alpha.unsqueeze(3) * _t(V).unsqueeze(1)
        flat = Vw.reshape(-1, K, H)
        _, (h_n, _) = lstm(flat, None)
        f = torch.cat([h_n[-1], h_n[-2]], dim=1).reshape(B, T, -1)

    params = {
        "affine_v": {"kernel": jnp.asarray(Wv.T)},
        "affine_g": {"kernel": jnp.asarray(Wg.T)},
        "affine_h": {"kernel": jnp.asarray(wh.T)},
        "lstm_fwd": {
            "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
            "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
            "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
        },
        "lstm_bwd": {
            "w_ih": jnp.asarray(lstm.weight_ih_l0_reverse.detach().numpy().T),
            "w_hh": jnp.asarray(lstm.weight_hh_l0_reverse.detach().numpy().T),
            "b_ih": jnp.asarray(lstm.bias_ih_l0_reverse.detach().numpy()),
            "b_hh": jnp.asarray(lstm.bias_hh_l0_reverse.detach().numpy()),
        },
    }
    jf, jalpha = att.recurrent_attention(params, jnp.asarray(V), jnp.asarray(h), True)
    np.testing.assert_allclose(np.asarray(jalpha), alpha.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jf), f.numpy(), atol=ATOL)


# ------------------------------------------------------------------- inits
def test_gains_match_torch():
    from torch.nn import init as tinit

    for nl in ("linear", "sigmoid", "tanh", "relu"):
        assert abs(inits.calculate_gain(nl) - tinit.calculate_gain(nl)) < 1e-9


def test_orthogonal_is_orthonormal():
    k = jax.random.PRNGKey(0)
    w = inits.orthogonal(k, (12, 8))
    np.testing.assert_allclose(np.asarray(w.T @ w), np.eye(8), atol=1e-5)
    w2 = inits.orthogonal(k, (8, 12))
    np.testing.assert_allclose(np.asarray(w2 @ w2.T), np.eye(8), atol=1e-5)


def test_lstm_init_forget_bias():
    p = inits.lstm_init(jax.random.PRNGKey(0), 6, 4)
    assert p["w_ih"].shape == (6, 16) and p["w_hh"].shape == (4, 16)
    b = np.asarray(p["b_ih"])
    assert (b[4:8] == 0.5).all() and (b[:4] == 0).all() and (b[8:] == 0).all()


def test_init_distributions_match_torch_stats():
    # distribution-level check: std of kaiming_uniform matches torch's bound
    k = jax.random.PRNGKey(1)
    w = inits.kaiming_uniform(k, (256, 128), "relu")
    bound = np.sqrt(3.0) * np.sqrt(2.0) / np.sqrt(256)
    assert float(jnp.abs(w).max()) <= bound + 1e-6
    assert float(jnp.abs(w).max()) > bound * 0.95
    wn = inits.xavier_normal(jax.random.PRNGKey(2), (256, 128), "tanh")
    expected_std = (5.0 / 3.0) * np.sqrt(2.0 / (256 + 128))
    assert abs(float(wn.std()) - expected_std) / expected_std < 0.05
