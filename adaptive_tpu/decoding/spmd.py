"""shard_map wrapping for the Pallas decode path on multi-device meshes.

XLA's GSPMD partitioner handles the pure-XLA decode fallback automatically
(proven single-device-bit-equal at mesh (4,2) in tests/test_sharding.py), but
a Pallas kernel is a custom call GSPMD cannot split — on a multi-device mesh
the fused decode cell and the fused vocab-head kernels must run under an
explicit jax.shard_map with per-device shapes. This module owns that wrap:

* data parallelism: the batch (images, decode state, V/pv slots) is sharded
  over the mesh's first axis; the fused cell is purely row-parallel, so each
  device runs the unmodified kernel on its rows.
* tensor parallelism (mesh model axis > 1): the embedding table rows and the
  hoisted vocab head columns shard over the model axis. The embed gather
  assembles rows with a psum (models/decoders.py::embed_lookup, bit-exact);
  the head runs the top-k kernel per shard in global index space — NEG bias
  padding replaces index masking (prepare_greedy_head) — and the per-shard
  (value, index) lists merge with the kernel's own tie rule
  (models/decoders.py::_tp_merge_topk), so greedy/beam ids equal the
  single-device kernels bit-for-bit.

The reference's only analogue wraps the sampler's encoder in
torch.nn.DataParallel (adaptive_attention.py:178-181); TP decode has no
reference counterpart.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P


def decode_mesh(model, cf) -> Optional[Mesh]:
    """The mesh the Pallas decode path must shard_map over, or None when the
    plain jit path applies (single device, Pallas off, or a non-adaptive
    variant whose decode never enters a Pallas kernel)."""
    if not (model.use_pallas and model.spec.variant == "adaptive_attention"):
        return None
    if len(jax.devices()) <= 1:
        return None
    from adaptive_tpu.parallel import make_mesh

    mesh = make_mesh(cf)
    return mesh if mesh.size > 1 else None


def prepared_specs(prepared, mesh: Mesh, axes) -> Tuple[object, Optional[str], bool]:
    """(in_specs tree for the prepared-weights arg, tp_axis, head_tp).

    Mirrors parallel.mesh.param_sharding_rules so a caller that sharded its
    params with shard_params hands them to shard_map with zero resharding:
    embed rows and mlp/head vocab dims over the model axis when divisible,
    everything else replicated. head_tp reports whether the hoisted head
    tuple actually shards (drives the cross-shard merge in the decode step).
    """
    model_axis = axes[1] if len(axes) > 1 else None
    tp = int(mesh.shape.get(model_axis, 1)) if model_axis else 1
    head = prepared.get("head") if hasattr(prepared, "get") else None
    head_tp = bool(tp > 1 and head is not None and head[0].shape[1] % tp == 0)

    def rule(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if tp > 1 and names and names[0] == "head":
            if head_tp:
                return P(None, model_axis) if leaf.ndim == 2 else P(model_axis)
            return P()
        if tp > 1 and "embed" in names and leaf.shape[0] % tp == 0:
            return P(model_axis, None)
        if tp > 1 and "mlp" in names and names[-1] == "kernel" and leaf.shape[1] % tp == 0:
            return P(None, model_axis)
        if tp > 1 and "mlp" in names and names[-1] == "bias" and leaf.shape[0] % tp == 0:
            return P(model_axis)
        return P()

    specs = jax.tree_util.tree_map_with_path(rule, prepared)
    return specs, (model_axis if tp > 1 else None), head_tp


def wrap_decode_body(body, mesh: Optional[Mesh], axes, out_specs_fn):
    """jit a decode body, shard_mapped over `mesh` when one is active.

    body(prepared, images_u8, tp_axis=None, head_tp=False) -> pytree with
    every leaf batch-leading. out_specs_fn(P) -> the out_specs pytree for a
    given batch-dim spec. Batches that don't divide the data axis fall back
    to the plain body in the same jit (GSPMD handles the non-Pallas ops; a
    Pallas call would be the single-device program replicated — loud and
    slow rather than wrong, and unreachable from the padded-batch loaders).
    """
    if mesh is None:
        return jax.jit(body)

    data_axis = axes[0]
    data_n = int(mesh.shape[data_axis])

    @jax.jit
    def decode_prepared(prepared, images_u8):
        if images_u8.shape[0] % data_n:
            return body(prepared, images_u8)
        specs, tp_axis, head_tp = prepared_specs(prepared, mesh, axes)
        import functools

        fn = jax.shard_map(
            functools.partial(body, tp_axis=tp_axis, head_tp=head_tp),
            mesh=mesh,
            in_specs=(specs, P(data_axis)),
            out_specs=out_specs_fn(P(data_axis)),
            check_vma=False,
        )
        return fn(prepared, images_u8)

    return decode_prepared
