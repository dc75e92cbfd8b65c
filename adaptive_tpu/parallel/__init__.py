from adaptive_tpu.parallel.mesh import (
    make_mesh,
    place_batch,
    opt_state_sharding_rules,
    param_sharding_rules,
    shard_batch,
    shard_opt_state,
    shard_params,
)

__all__ = [
    "make_mesh",
    "place_batch",
    "shard_batch",
    "shard_params",
    "param_sharding_rules",
    "shard_opt_state",
    "opt_state_sharding_rules",
]
