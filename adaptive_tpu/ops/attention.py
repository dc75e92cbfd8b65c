"""Spatial / adaptive (visual-sentinel) / recurrent attention math.

Reference parity (exact fp32 math, batched over time):
* spatial attention  — code_src/models/baseline_attention.py:66-96
* sentinel + adaptive attention — code_src/models/adaptive_attention.py:12-85
* recurrent (sigmoid-gated, LSTM-aggregated) attention —
  code_src/models/rnn_attention.py:13-67

Terminology: V [B, K, H] spatial features (K=49 slots from the 7x7 map),
h [B, T, H] decoder hiddens, s [B, T, H] sentinel. The attention projection
dim D equals K in the reference (both 49) but is kept distinct here.

All functions are pure; Pallas-fused versions for the decode hot path live in
adaptive_tpu.ops.pallas (same signatures, numerically equal).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from adaptive_tpu.ops.dropout import Drop, maybe_drop as _d


def precompute_slots(params, V: jnp.ndarray) -> jnp.ndarray:
    """pv = V @ Wv [B,K,D] — loop-invariant across decode steps. The reference
    recomputes this every timestep (baseline_attention.py:86); hoisting it out
    of the decode scan saves B*K*H*D MACs per step."""
    return V @ params["affine_v"]["kernel"]


def attention_logits(
    params, V: jnp.ndarray, h: jnp.ndarray, pv: Optional[jnp.ndarray] = None,
    drop: Drop = None,
) -> jnp.ndarray:
    """z [B,T,K]: additive attention scores (baseline_attention.py:86-90).

    z[b,t,i] = sum_j tanh( (V@Wv)[b,i,j] + (h@Wg)[b,t,j] ) * wh[j]

    drop: train-time dropout before each affine, where the reference's
    Dropout modules sit (baseline_attention.py:86-90: affine_v(dropout(V)) +
    affine_g(dropout(h)), affine_h(dropout(tanh(content)))). Active dropout
    overrides pv (the hoisted V projection has no mask).
    """
    if drop is not None:
        pv = drop(V) @ params["affine_v"]["kernel"]  # [B,K,D]
    elif pv is None:
        pv = precompute_slots(params, V)  # [B,K,D]
    ph = _d(drop, h) @ params["affine_g"]["kernel"]  # [B,T,D]
    content = jnp.tanh(pv[:, None, :, :] + ph[:, :, None, :])  # [B,T,K,D]
    return jnp.squeeze(_d(drop, content) @ params["affine_h"]["kernel"], -1)  # [B,T,K]


def spatial_attention(
    params, V: jnp.ndarray, h: jnp.ndarray, pv: Optional[jnp.ndarray] = None,
    drop: Drop = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Baseline Atten.forward (baseline_attention.py:78-96).

    Returns (c [B,T,H], alpha [B,T,K]).
    """
    z = attention_logits(params, V, h, pv, drop)
    alpha = jax.nn.softmax(z, axis=-1)
    c = alpha @ V  # [B,T,K] @ [B,K,H] -> [B,T,H]  (raw V: bmm has no dropout)
    return c, alpha


def sentinel_gate(
    params, x: jnp.ndarray, h_prev: jnp.ndarray, c: jnp.ndarray, drop: Drop = None
) -> jnp.ndarray:
    """Visual sentinel s_t = sigmoid(Wx x_t + Wh h_{t-1}) * tanh(c_t)
    (adaptive_attention.py:75-85). x [B,T,2E], h_prev/c [B,T,H]. drop sits
    before each affine (adaptive_attention.py:79)."""
    g = jax.nn.sigmoid(
        _d(drop, x) @ params["affine_x"]["kernel"]
        + _d(drop, h_prev) @ params["affine_h"]["kernel"]
    )
    return g * jnp.tanh(c)


def adaptive_attention(
    params, V: jnp.ndarray, h: jnp.ndarray, s: jnp.ndarray, pv: Optional[jnp.ndarray] = None,
    drop: Drop = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Adaptive Atten.forward (adaptive_attention.py:26-58).

    Returns (c_hat [B,T,H], alpha [B,T,K], beta [B,T,1]) where alpha is the
    K-way spatial softmax (not the K+1 concat softmax), matching the
    reference's returned attention maps, and beta is the sentinel mass of the
    (K+1)-way softmax over [z; z_s].
    """
    z = attention_logits(params, V, h, pv, drop)  # [B,T,K]
    alpha = jax.nn.softmax(z, axis=-1)
    c = alpha @ V  # [B,T,H]

    # Sentinel logit z_s[b,t] = sum_j tanh((s@Ws + h@Wg)[b,t,j]) * wh[j]
    # (adaptive_attention.py:44-47); drop before each affine (:45-47).
    content_s = jnp.tanh(
        _d(drop, s) @ params["affine_s"]["kernel"]
        + _d(drop, h) @ params["affine_g"]["kernel"]
    )
    z_s = _d(drop, content_s) @ params["affine_h"]["kernel"]  # [B,T,1]

    extended = jnp.concatenate([z, z_s], axis=-1)  # [B,T,K+1]
    alpha_hat = jax.nn.softmax(extended, axis=-1)
    beta = alpha_hat[..., -1:]  # [B,T,1]

    c_hat = beta * s + (1.0 - beta) * c  # adaptive_attention.py:54-56
    return c_hat, alpha, beta


def recurrent_attention(
    params, V: jnp.ndarray, h: jnp.ndarray, bidirectional: bool = True,
    pv: Optional[jnp.ndarray] = None, drop: Drop = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rnn_attention Atten.forward (rnn_attention.py:31-67).

    Per-slot sigmoid gates (not softmax) weight V; an LSTM consumes the K
    weighted slots as a sequence and its final hidden(s) form the context.
    Returns (F_T [B,T,Hr], alpha [B,T,K]).
    """
    from adaptive_tpu.ops.lstm import lstm_scan

    B, K, H = V.shape
    T = h.shape[1]
    z = attention_logits(params, V, h, pv, drop)  # [B,T,K]
    alpha = jax.nn.sigmoid(z)  # rnn_attention.py:47
    Vw = alpha[..., None] * V[:, None, :, :]  # [B,T,K,H]
    flat = Vw.reshape(B * T, K, H)

    hr = params["lstm_fwd"]["w_hh"].shape[0]
    zero = (jnp.zeros((B * T, hr), V.dtype), jnp.zeros((B * T, hr), V.dtype))
    h_fwd, _, (hT_fwd, _) = lstm_scan(params["lstm_fwd"], flat, zero)
    if bidirectional:
        # torch bidirectional: reverse input for the backward direction; the
        # reference concats (h_T[-1], h_T[-2]) = (backward, forward)
        # (rnn_attention.py:59-60).
        _, _, (hT_bwd, _) = lstm_scan(params["lstm_bwd"], flat[:, ::-1, :], zero)
        f = jnp.concatenate([hT_bwd, hT_fwd], axis=-1)
    else:
        f = h_fwd[:, -1, :]  # rnn_attention.py:65
    return f.reshape(B, T, -1), alpha
