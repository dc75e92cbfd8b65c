"""Test env: force CPU JAX with 8 virtual devices (sharding tests without TPUs).

Mirrors SURVEY.md §4's implication: the reference has no test suite; this
framework tests kernels vs. oracles, the 20-image overfit fixture, scorer
fixtures, and mesh sharding on a virtual device grid.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests never touch the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The jaxtyping pytest plugin imports jax before this conftest runs, baking
# the environment's JAX_PLATFORMS (the axon TPU tunnel) into jax.config — the
# env var alone is too late. Override via config; the backend itself
# initializes lazily, so this takes effect.
jax.config.update("jax_platforms", "cpu")

# XLA:CPU's fast-math matmuls break fp32 parity assertions; full precision.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_cf():
    """A tiny config: resnet18 @ 64px (4 slots), small vocab/dims — fast on CPU."""
    from adaptive_tpu.config import Config

    return Config(
        atten_model_name="adaptive_attention",
        encoder_backbone="resnet18",
        train_crop_size=64,
        resized_image_size=72,
        vocab_length=32,
        adaptive_word_embed_size=8,
        adaptive_lstm_hidden_size=16,
        base_word_embed_size=8,
        base_lstm_hidden_size=16,
        rnn_attention_embed_size=8,
        rnn_attention_hiddensize=16,
        train_batch_size=2,
        eval_batch_size=2,
        decode_max_len=5,
    )
