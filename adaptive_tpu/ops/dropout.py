"""Inverted dropout for the training forward (config knob train_dropout_rate).

Reference parity: every attention/affine site in the reference carries an
nn.Dropout whose rate is HARDCODED to zero (baseline_attention.py:26,73,
adaptive_attention.py:21,70,103, rnn_attention.py:21) — the author's notes
flag it as an open "left freedom" (for_wzn:20,24); the paper the reference
implements (Lu et al. 2017) trained with dropout 0.5. The default here is
0.0 == the reference's exact behavior; a non-zero rate applies torch-style
inverted dropout (scale by 1/keep at train time, identity at eval) at the
same sites the reference's Dropout modules sit.

Each call of the returned closure draws an independent mask (a trace-time
counter folds the key), matching torch where one nn.Dropout module resamples
per invocation. Masks are a deterministic function of the step rng, so
jax.checkpoint rematerialization replays identical bits.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Drop = Optional[Callable[[jnp.ndarray], jnp.ndarray]]


def make_dropout(rng, rate: float) -> Drop:
    """None when inactive (rate 0 or no rng) — callers treat None as identity."""
    if rng is None or not rate:
        return None
    if not 0.0 < rate < 1.0:
        raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
    keep = 1.0 - float(rate)
    counter = itertools.count()

    def drop(x: jnp.ndarray) -> jnp.ndarray:
        key = jax.random.fold_in(rng, next(counter))
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)

    return drop


def maybe_drop(drop: Drop, x: jnp.ndarray) -> jnp.ndarray:
    return x if drop is None else drop(x)
