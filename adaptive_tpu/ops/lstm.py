"""LSTM cell with torch-equivalent math, driven by lax.scan.

Reference parity: the reference steps ``nn.LSTM(embed*2, hidden, 1,
batch_first=True)`` one token at a time in a Python loop
(code_src/models/baseline_attention.py:140,167-178). Here the identical cell
math (gate order i,f,g,o; two bias vectors) is a pure function scanned over
time by XLA — one compiled loop instead of T dispatched graph launches.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

LSTMState = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c), each [B, H]


def _gates_step(gates_x: jnp.ndarray, params: Dict[str, jnp.ndarray], state: LSTMState) -> Tuple[jnp.ndarray, LSTMState]:
    """Cell math given the precomputed input projection gates_x = x@Wih + b_ih.

    gates = gates_x + h@Whh + b_hh, split [i, f, g, o] (torch order);
    c' = f*c + i*g ; h' = o*tanh(c').
    """
    h, c = state
    gates = gates_x + h @ params["w_hh"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def lstm_cell(params: Dict[str, jnp.ndarray], x: jnp.ndarray, state: LSTMState) -> Tuple[jnp.ndarray, LSTMState]:
    """One step. x [B, I]; returns (h', (h', c'))."""
    return _gates_step(x @ params["w_ih"] + params["b_ih"], params, state)


def lstm_scan(params: Dict[str, jnp.ndarray], xs: jnp.ndarray, state: LSTMState) -> Tuple[jnp.ndarray, jnp.ndarray, LSTMState]:
    """Run the cell over time. xs [B, T, I] -> (hiddens [B,T,H], cells [B,T,H], final state).

    Replaces the per-timestep Python loop at baseline_attention.py:167-178
    (which also materializes the per-step cell states for the sentinel).
    The time-invariant input projection x@Wih is hoisted out of the scan as
    one [B*T, I]@[I, 4H] MXU matmul (the cuDNN-style split); only the h@Whh
    recurrence stays sequential. Per-row math is unchanged.
    """
    gx = xs @ params["w_ih"] + params["b_ih"]  # [B, T, 4H], batched over T

    def step(carry, g_t):
        h_new, carry = _gates_step(g_t, params, carry)
        return carry, (h_new, carry[1])

    gx_t = jnp.swapaxes(gx, 0, 1)  # [T, B, 4H] — scan over leading axis
    final, (hs, cs) = jax.lax.scan(step, state, gx_t)
    return jnp.swapaxes(hs, 0, 1), jnp.swapaxes(cs, 0, 1), final
