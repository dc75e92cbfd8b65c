"""Mesh/sharding tests on the 8-virtual-device CPU grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from adaptive_tpu.parallel import make_mesh, param_sharding_rules, shard_batch, shard_params


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_wildcard():
    mesh = make_mesh(shape=(-1, 2), axes=("data", "model"))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh2 = make_mesh(shape=(-1, 1), axes=("data", "model"))
    assert dict(mesh2.shape) == {"data": 8, "model": 1}


def test_batch_sharding_splits_leading_dim():
    mesh = make_mesh(shape=(8, 1), axes=("data", "model"))
    batch = {"images": np.zeros((16, 8, 8, 3), np.uint8), "lengths": np.arange(16)}
    sharded = shard_batch(mesh, batch)
    shard_shapes = [s.data.shape for s in sharded["images"].addressable_shards]
    assert all(s == (2, 8, 8, 3) for s in shard_shapes)


def test_param_sharding_rules_tp():
    mesh = make_mesh(shape=(4, 2), axes=("data", "model"))
    params = {
        "decoder": {
            "embed": jnp.zeros((64, 16)),
            "adaptive": {"mlp": {"kernel": jnp.zeros((32, 64)), "bias": jnp.zeros((64,))}},
            "lstm": {"w_ih": jnp.zeros((8, 32))},
        }
    }
    rules = param_sharding_rules(params, mesh)
    assert rules["decoder"]["embed"].spec == P("model", None)
    assert rules["decoder"]["adaptive"]["mlp"]["kernel"].spec == P(None, "model")
    assert rules["decoder"]["adaptive"]["mlp"]["bias"].spec == P("model")
    assert rules["decoder"]["lstm"]["w_ih"].spec == P()


def test_param_sharding_skips_indivisible():
    mesh = make_mesh(shape=(4, 2), axes=("data", "model"))
    params = {"decoder": {"embed": jnp.zeros((63, 16))}}  # 63 % 2 != 0
    rules = param_sharding_rules(params, mesh)
    assert rules["decoder"]["embed"].spec == P()


def test_sharded_train_step_runs_and_matches_single_device(tiny_cf):
    """One SPMD train step on a (4,2) mesh == the same step on one device."""
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = tiny_cf.replace(vocab_length=64, mesh_shape=(4, 2))
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    dual, opt_state = make_dual_optimizer(params, cf)
    step = make_train_step(model, dual, cf)

    rng = np.random.default_rng(0)
    B, T = 8, 6
    batch = {
        "images": rng.integers(0, 255, (B, 72, 72, 3), dtype=np.uint8),
        "captions": rng.integers(1, 64, (B, T)).astype(np.int32),
        "lengths": np.full((B,), T, np.int32),
    }
    key = jax.random.PRNGKey(1)

    out_single = step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
        jax.tree.map(jnp.copy, opt_state), dict(batch), key, True,
    )

    mesh = make_mesh(cf)
    p2 = shard_params(jax.tree.map(jnp.copy, params), mesh)
    b2 = shard_batch(mesh, batch)
    out_sharded = step(p2, jax.tree.map(jnp.copy, state), jax.tree.map(jnp.copy, opt_state), b2, key, True)

    np.testing.assert_allclose(float(out_single.loss), float(out_sharded.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_single.params["decoder"]["embed"]),
        np.asarray(out_sharded.params["decoder"]["embed"]),
        atol=1e-5,
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
