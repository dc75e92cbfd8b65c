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


def _to_host(leaf) -> np.ndarray:
    """Fetch a leaf to host, gathering globally-sharded arrays first.

    With ZeRO-1 (opt_state_sharding='data') on a multi-host mesh the moments
    are global arrays that are not fully addressable from any one process, so
    a bare np.asarray raises. process_allgather materializes the full value on
    every process, keeping the checkpoint a complete single-file artifact."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = _to_host(leaf)
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
        # read dtype from the attribute (never materialize the template —
        # ZeRO-1 templates on a multi-host mesh aren't fully addressable)
        dtype = getattr(leaf, "dtype", None)
        leaves.append(arr.astype(dtype if dtype is not None else np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    params: Any,
    model_state: Any,
    opt_state: Any = None,
    metadata: Optional[Dict] = None,
    prune_before: Optional[Tuple[int, int]] = None,
):
    """Write checkpoint dir: model.npz (+opt.npz) + manifest.json.

    Atomic: everything lands in '<path>.tmp' which is renamed into place, so
    a crash mid-write can never leave a half-readable checkpoint (restore
    paths only ever see complete directories). `prune_before`: a resume point
    (epoch, step) — mid-epoch '_step-K' checkpoints strictly before it are
    deleted AFTER this one is durable. The stale set is listed inside the
    write (not at the call site), so an async save sequenced behind a
    still-in-flight step write sees and prunes it; ordering guarantees a
    complete resume point exists at every instant."""
    flat_model = _flatten({"params": params, "state": model_state})
    flat_opt = _flatten(opt_state) if opt_state is not None else None
    _write_checkpoint_files(path, flat_model, flat_opt, metadata, prune_before)


def _write_checkpoint_files(path, flat_model, flat_opt, metadata, prune_before=None):
    import shutil

    path = path.rstrip("/")
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    np.savez(os.path.join(tmp, "model.npz"), **flat_model)
    if flat_opt is not None:
        np.savez(os.path.join(tmp, "opt.npz"), **flat_opt)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, default=str)
    if os.path.exists(path):
        # Overwrite via swap: the existing checkpoint is parked at '.old'
        # (invisible to find_latest_checkpoint, like '.tmp') and removed only
        # after the new one is fully in place — no crash window destroys data.
        # Refuse to replace a directory that isn't a checkpoint (protects
        # arbitrary destinations from deletion).
        if not os.path.isdir(path) or not os.path.exists(os.path.join(path, "model.npz")):
            # covers both a non-checkpoint directory and a regular file at the
            # destination — neither may be silently swapped out and deleted
            raise ValueError(
                f"{path} exists and is not a checkpoint dir; refusing to replace"
            )
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.replace(tmp, path)
    if prune_before is not None:
        # only ever prunes mid-epoch step checkpoints (stale_step_checkpoints
        # filters), and only now that the newer one is durably in place
        # (crash-safe: at worst a stale dir survives and is pruned by the
        # next successful write)
        for stale in stale_step_checkpoints(os.path.dirname(path), *prune_before):
            shutil.rmtree(stale, ignore_errors=True)


class AsyncCheckpointer:
    """Overlap checkpoint serialization/IO with training (orbax-style).

    save() fetches arrays to host on the caller's thread (required: the train
    step donates its buffers, so device arrays must be copied out before the
    next step reuses them) and hands the npz/manifest writes to a background
    thread. At most one write is in flight — a second save() waits for the
    first, bounding host memory to one checkpoint. wait() joins the pending
    write; always call it before reading checkpoints back or exiting.

    The reference blocks training for the full torch.save each epoch
    (train.py:176-178); here the step only pays for the device->host fetch.
    """

    def __init__(self):
        import threading

        self._thread: Optional["threading.Thread"] = None
        self._error: Optional[BaseException] = None

    def save(self, path, params, model_state, opt_state=None, metadata=None,
             prune_before=None):
        import threading

        self.wait()  # one in-flight write max; surfaces prior write errors
        flat_model = _flatten({"params": params, "state": model_state})
        flat_opt = _flatten(opt_state) if opt_state is not None else None

        def work():
            try:
                _write_checkpoint_files(
                    path, flat_model, flat_opt, metadata, prune_before
                )
            except BaseException as e:  # surfaced on the next save()/wait()
                self._error = e

        # non-daemon: if the main thread dies (OOM, eval crash) the interpreter
        # still joins this thread at exit, so the in-flight checkpoint lands —
        # the synchronous path's durability, without blocking the epoch.
        self._thread = threading.Thread(target=work, daemon=False)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


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


def step_checkpoint_name(epoch: int, step: int) -> str:
    """Mid-epoch checkpoint name: the epoch-name contract plus a '_step-K'
    suffix (K = steps already completed in epoch E). The suffix keeps these
    invisible to find_best_checkpoint (no CIDEr has been measured yet) while
    find_latest_checkpoint ranks them between epoch E-1's and epoch E's
    completes."""
    return "cider-0.0000_model-%d_step-%d" % (epoch, step)


def _resume_point(name: str) -> Optional[Tuple[int, int]]:
    """(epoch_to_run, step_to_start_at) a checkpoint dir name resumes into,
    or None if the name is not a checkpoint. Epoch-complete 'model-N' resumes
    at (N+1, 0); mid-epoch 'model-N_step-K' resumes at (N, K) — ordering
    these tuples ranks any mix of the two kinds chronologically."""
    m = re.search(r"model-(\d+)(?:_step-(\d+))?$", name)
    if not m:
        return None
    if m.group(2) is None:
        return (int(m.group(1)) + 1, 0)
    return (int(m.group(1)), int(m.group(2)))


def find_latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the latest complete checkpoint dir under `directory` — the one
    whose resume point (epoch, step) is furthest along, ranking mid-epoch
    '_step-K' checkpoints between their surrounding epoch completes.

    Matches the 'cider-X.XXXX_model-N[_step-K]' naming contract; in-flight
    '.tmp' staging dirs (AsyncCheckpointer) are never matched, so a checkpoint
    interrupted mid-write is invisible here. Returns None when the directory
    does not exist or holds no checkpoints — auto-resume's fresh-start case.
    """
    if not directory or not os.path.isdir(directory):
        return None
    best: Tuple[Tuple[int, int], str] = ((-1, -1), "")
    for name in os.listdir(directory):
        if name.endswith(".tmp"):
            continue
        point = _resume_point(name)
        full = os.path.join(directory, name)
        if point is not None and os.path.isdir(full) and point > best[0]:
            best = (point, full)
    return best[1] or None


def stale_step_checkpoints(directory: str, epoch: int, step: int) -> list:
    """Mid-epoch checkpoint dirs whose resume point is strictly before
    (epoch, step) — prune candidates once a (epoch, step) checkpoint is
    durable. Epoch-complete checkpoints are never returned (the per-epoch
    history is the reference contract and stays)."""
    out = []
    if not directory or not os.path.isdir(directory):
        return out
    for name in os.listdir(directory):
        if "_step-" not in name or name.endswith(".tmp"):
            continue
        point = _resume_point(name)
        if point is not None and point < (epoch, step):
            out.append(os.path.join(directory, name))
    return out


def find_best_checkpoint(directory: str) -> Optional[str]:
    """Path of the highest-CIDEr complete checkpoint dir under `directory`
    (the 'cider-X.XXXX' prefix of the reference's filename contract). Ties
    go to the later epoch. None when nothing matches."""
    if not directory or not os.path.isdir(directory):
        return None
    best: Tuple[float, int, str] = (-1.0, -1, "")
    for name in os.listdir(directory):
        if name.endswith(".tmp"):
            continue
        m = re.match(r"cider-([\d.]+)_model-(\d+)$", name)
        full = os.path.join(directory, name)
        if m and os.path.isdir(full):
            key = (float(m.group(1)), int(m.group(2)), full)
            if key[:2] > best[:2]:
                best = key
    return best[2] or None


def epoch_from_filename(path: str) -> int:
    """Parse epoch N from '...model-N[.*]' (model_factory.py:19)."""
    m = re.search(r"model-(\d+)", os.path.basename(path.rstrip("/")))
    if not m:
        raise ValueError(f"cannot parse epoch from checkpoint name {path!r}")
    return int(m.group(1))
