"""ops/quant_conv: manual conv-backward formulas vs jax autodiff (bit-tight)
and the int8 backward's approximation quality (VERDICT r2 #9 experiment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.ops import quant_conv as qc


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    qc.set_conv_bwd_quant("none")


def _grads(mode, x, w):
    qc.set_conv_bwd_quant(mode)

    def loss(x, w):
        y = qc.conv_nhwc(x, w, 1)
        return jnp.sum(y * jnp.cos(y))  # nontrivial cotangent

    return jax.grad(loss, argnums=(0, 1))(x, w)


@pytest.mark.parametrize("k,cin,cout,hw", [(3, 8, 16, 10), (1, 16, 8, 7), (5, 4, 4, 12)])
def test_manual_backward_matches_autodiff(k, cin, cout, hw):
    """'manual' mode = the hand-derived dx/dw contractions in full precision;
    must equal jax's own conv transpose to float tolerance."""
    x = _rand((2, hw, hw, cin), 0)
    w = _rand((k, k, cin, cout), 1) * 0.2
    gx_ref, gw_ref = _grads("none", x, w)
    gx, gw = _grads("manual", x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-4, rtol=1e-4)


def test_int8_backward_close_to_exact():
    """int8 backward: same contractions with 8-bit operands — grads must
    correlate strongly with the exact ones (quantization noise only)."""
    x = _rand((2, 10, 10, 8), 2)
    w = _rand((3, 3, 8, 16), 3) * 0.2
    gx_ref, gw_ref = _grads("none", x, w)
    gx, gw = _grads("int8", x, w)
    for got, ref in ((gx, gx_ref), (gw, gw_ref)):
        got, ref = np.asarray(got).ravel(), np.asarray(ref).ravel()
        cos = got @ ref / (np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.99, cos
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.1, rel


def test_forward_exact_in_all_modes():
    """The forward pass must be bit-identical across modes (only the VJP
    changes) — production forward numerics never move."""
    x = _rand((2, 9, 9, 4), 4)
    w = _rand((3, 3, 4, 8), 5)
    outs = []
    for mode in ("none", "manual", "int8"):
        qc.set_conv_bwd_quant(mode)
        outs.append(np.asarray(qc.conv_nhwc(x, w, 1)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_strided_conv_keeps_exact_backward():
    """stride-2 convs bypass the experiment (their transpose needs dilated
    asymmetric padding) — gradients equal exact in every mode."""
    x = _rand((2, 8, 8, 4), 6)
    w = _rand((3, 3, 4, 8), 7)

    def loss(x, w):
        return jnp.sum(qc.conv_nhwc(x, w, 2) ** 2)

    qc.set_conv_bwd_quant("none")
    ref = jax.grad(loss)(x, w)
    qc.set_conv_bwd_quant("int8")
    got = jax.grad(loss)(x, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resnet_conv_unchanged_by_default():
    from adaptive_tpu.models.resnet import _conv

    x = _rand((1, 8, 8, 3), 8)
    w = _rand((3, 3, 3, 4), 9)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_array_equal(np.asarray(_conv(x, w, 1)), np.asarray(want))
