"""Checkpointing: params + BN state + optimizer state + metadata.

Reference parity+: the reference saves only model.state_dict() per epoch as
'cider-%.4f_model-%d.pkl' (train.py:176-178) and cannot resume optimizer
state (model_factory.py:15-19, a deficiency its author noted, for_wzn:15-17).
Here a checkpoint is a directory containing a flat .npz of every array leaf
(path-encoded keys) plus a JSON manifest — full resume of params, BN stats,
optimizer moments and step. Filenames keep the reference's metadata contract
('cider-X.XXXX_model-N') so epoch parsing works the same way.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "|"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return f"#{p.idx}"
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild a pytree with template's structure, values from flat."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    params: Any,
    model_state: Any,
    opt_state: Any = None,
    metadata: Optional[Dict] = None,
):
    """Write checkpoint dir: model.npz (+opt.npz) + manifest.json."""
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "model.npz"), **_flatten({"params": params, "state": model_state}))
    if opt_state is not None:
        np.savez(os.path.join(path, "opt.npz"), **_flatten(opt_state))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, default=str)


def restore_model(path: str, params_template: Any, state_template: Any) -> Tuple[Any, Any]:
    """Restore (params, model_state) from a checkpoint dir (or its model.npz)."""
    npz = path if path.endswith(".npz") else os.path.join(path, "model.npz")
    with np.load(npz) as data:
        flat = dict(data)
    tree = _unflatten_into({"params": params_template, "state": state_template}, flat)
    return tree["params"], tree["state"]


def restore_opt_state(path: str, opt_template: Any) -> Any:
    with np.load(os.path.join(path, "opt.npz")) as data:
        flat = dict(data)
    return _unflatten_into(opt_template, flat)


def load_metadata(path: str) -> Dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def checkpoint_name(cider: float, epoch: int) -> str:
    """'cider-%.4f_model-%d' — the reference's filename contract (train.py:178)."""
    return "cider-%.4f_model-%d" % (cider, epoch)


def epoch_from_filename(path: str) -> int:
    """Parse epoch N from '...model-N[.*]' (model_factory.py:19)."""
    m = re.search(r"model-(\d+)", os.path.basename(path.rstrip("/")))
    if not m:
        raise ValueError(f"cannot parse epoch from checkpoint name {path!r}")
    return int(m.group(1))
