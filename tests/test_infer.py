"""Inference fast path: BN folding + dtype casting must match the eval-mode
reference forward."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_tpu.models import resnet as R
from adaptive_tpu.models.factory import build_model
from adaptive_tpu.models.infer import cast_floating, fold_resnet, resnet_apply_folded


def test_folded_resnet_matches_eval_bn():
    params, state = R.init_resnet(jax.random.PRNGKey(0), "resnet18")
    # randomize BN stats so folding is non-trivial
    rng = np.random.default_rng(0)
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), jnp.float32), state
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    want, _ = R.resnet_apply(params, state, x, "resnet18", train=False)
    folded = fold_resnet(params, state, "resnet18")
    got = resnet_apply_folded(folded, x, "resnet18")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_encode_inference_matches_encode(tiny_cf):
    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(1))
    images = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 64, 3)), jnp.float32)
    V0, vg0, h00, c00, _ = model.encode(params, state, images, train=False)
    V1, vg1, h01, c01 = model.encode_inference(params, state, images)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(vg1), np.asarray(vg0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(h01), np.asarray(h00), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c01), np.asarray(c00), atol=2e-4)


def test_cast_floating_preserves_ints():
    tree = {"a": jnp.zeros(3, jnp.float32), "b": jnp.zeros(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16 and out["b"].dtype == jnp.int32
