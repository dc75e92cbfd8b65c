from adaptive_tpu.parallel.mesh import make_mesh, shard_batch, shard_params, param_sharding_rules

__all__ = ["make_mesh", "shard_batch", "shard_params", "param_sharding_rules"]
