"""Weight initializers with PyTorch-equivalent semantics.

Reference parity: code_src/models/model_utils.py:4-74 — xavier_{uniform,
normal} / kaiming_{uniform,normal} with nonlinearity gains, zero biases, and
LSTM init (orthogonal weights, zero bias, forget-gate bias 0.5 in *each* of
the two bias vectors => effective forget bias 1.0).

Kernels here are stored (fan_in, fan_out) — i.e. y = x @ W + b — which is the
transpose of torch's nn.Linear weight; fans are computed to match torch's
(fan_in = input features, fan_out = output features).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# torch.nn.init.calculate_gain values (model_utils.py uses linear/sigmoid/tanh/relu)
GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
}


def calculate_gain(nonlinearity: str, a: float = 0.0) -> float:
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + a * a))
    return GAINS[nonlinearity]


def _fans(shape: Tuple[int, ...]) -> Tuple[int, int]:
    """(fan_in, fan_out) for an (in, out) kernel; conv kernels are
    (kh, kw, in, out) with receptive-field scaling like torch."""
    if len(shape) == 2:
        return shape[0], shape[1]
    if len(shape) == 4:
        rf = shape[0] * shape[1]
        return shape[2] * rf, shape[3] * rf
    raise ValueError(f"unsupported kernel shape {shape}")


def xavier_uniform(key, shape, nonlinearity: str = "linear", dtype=jnp.float32):
    """U(-a, a), a = gain * sqrt(6 / (fan_in + fan_out)) (model_utils.py:4-16)."""
    fan_in, fan_out = _fans(shape)
    a = calculate_gain(nonlinearity) * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def xavier_normal(key, shape, nonlinearity: str = "linear", dtype=jnp.float32):
    """N(0, std^2), std = gain * sqrt(2 / (fan_in + fan_out)) (model_utils.py:19-31)."""
    fan_in, fan_out = _fans(shape)
    std = calculate_gain(nonlinearity) * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, nonlinearity: str = "relu", a: float = 0.0, dtype=jnp.float32):
    """U(-b, b), b = sqrt(3) * gain / sqrt(fan_in), fan_in mode (model_utils.py:34-45)."""
    fan_in, _ = _fans(shape)
    gain = calculate_gain(nonlinearity, a)
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal(key, shape, nonlinearity: str = "relu", a: float = 0.0, dtype=jnp.float32):
    """N(0, (gain/sqrt(fan_in))^2), fan_in mode (model_utils.py:48-59)."""
    fan_in, _ = _fans(shape)
    std = calculate_gain(nonlinearity, a) / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def orthogonal(key, shape, dtype=jnp.float32):
    """torch.nn.init.orthogonal_ semantics on a (rows, cols) matrix: QR of a
    standard-normal matrix with sign correction; semi-orthogonal when
    rectangular (rows of the smaller dimension orthonormal)."""
    rows, cols = shape
    n = max(rows, cols)
    m = min(rows, cols)
    a = jax.random.normal(key, (n, m), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if rows < cols:
        q = q.T
    return q.astype(dtype)


def lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """LSTM parameter tree matching torch layout/init (model_utils.py:62-74).

    Returns dict(w_ih (in, 4H), w_hh (H, 4H), b_ih (4H,), b_hh (4H,)) with
    gate order [i, f, g, o]; weights orthogonalized on torch's (4H, in)
    orientation then transposed; biases zero except forget slice = 0.5 each.
    """
    k1, k2 = jax.random.split(key)
    w_ih = orthogonal(k1, (4 * hidden_size, input_size), dtype).T
    w_hh = orthogonal(k2, (4 * hidden_size, hidden_size), dtype).T
    b = jnp.zeros((4 * hidden_size,), dtype)
    b = b.at[hidden_size : 2 * hidden_size].set(0.5)
    # b_ih/b_hh must be distinct buffers: donated pytrees may not alias
    return {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b, "b_hh": jnp.array(b)}


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def linear_params(key, in_dim: int, out_dim: int, init: str, nonlinearity: str, bias: bool = True, dtype=jnp.float32):
    """A linear layer param dict {'kernel': (in,out)[, 'bias': (out,)]} using
    one of the reference's four init schemes."""
    fn = {
        "xavier_uniform": xavier_uniform,
        "xavier_normal": xavier_normal,
        "kaiming_uniform": kaiming_uniform,
        "kaiming_normal": kaiming_normal,
    }[init]
    p = {"kernel": fn(key, (in_dim, out_dim), nonlinearity, dtype=dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(params, x):
    y = x @ params["kernel"]
    if "bias" in params:
        y = y + params["bias"]
    return y
