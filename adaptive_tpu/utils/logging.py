"""Metric writer + misc logging helpers.

Reference parity: tensorboardX SummaryWriter usage (train.py:47-49,128-138,
144,164,188,194 — scalar losses/LRs/CIDEr + weight/grad histograms) and the
HMS wall-clock pretty printer (tools/utils.py:274-283). MetricWriter emits
real TensorBoard event files via tensorboardX (the reference's own library)
so `tensorboard --logdir` plots a run's loss/CIDEr/LR curves and weight
histograms, plus newline-delimited JSON (scalars.jsonl / histograms.jsonl)
with the same tag structure as a grep-able fallback that needs no reader.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np


class MetricWriter:
    """Append-only JSONL scalar/histogram writer with tensorboard-like tags."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._scalars = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._hists = open(os.path.join(logdir, "histograms.jsonl"), "a")
        try:  # real event files (train.py:47-49); JSONL still written below
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir=logdir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        self._scalars.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}) + "\n"
        )
        if self._tb is not None:
            try:
                self._tb.add_scalar(tag, float(value), int(step))
            except Exception:  # TB is best-effort; JSONL already written
                pass

    def add_scalars(self, tag: str, values: Dict[str, float], step: int):
        for k, v in values.items():
            self.add_scalar(f"{tag}/{k}", v, step)

    def add_histogram(self, tag: str, values, step: int, bins: int = 32):
        arr = np.asarray(values).ravel().astype(np.float64)
        if arr.size == 0:
            return
        counts, edges = np.histogram(arr, bins=bins)
        self._hists.write(
            json.dumps(
                {
                    "tag": tag,
                    "step": int(step),
                    "min": float(arr.min()),
                    "max": float(arr.max()),
                    "mean": float(arr.mean()),
                    "std": float(arr.std()),
                    "counts": counts.tolist(),
                    "edges": edges.tolist(),
                }
            )
            + "\n"
        )
        if self._tb is not None:
            try:  # after JSONL: a TB failure (e.g. inf/NaN weights mid-run)
                self._tb.add_histogram(tag, arr, int(step), bins=bins)
            except Exception:  # must not kill training or lose the JSONL line
                pass

    def add_param_histograms(self, params, step: int, skip_substr: str = "resnet",
                             max_elems: int = 65536):
        """Weight histograms for non-resnet params (train.py:129-131 parity).

        Large tensors (embedding, vocab head) are strided-subsampled to
        `max_elems` so a dump costs a bounded device->host transfer (this
        rig's tunnel downloads at ~3 MB/s; full tensors would stall training
        for seconds per dump)."""
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            if skip_substr and skip_substr in name:
                continue
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            if n > max_elems:
                stride = -(-n // max_elems)
                leaf = leaf.reshape(-1)[::stride]
            self.add_histogram("Weights_" + name, np.asarray(leaf), step)

    def flush(self):
        self._scalars.flush()
        self._hists.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._scalars.close()
        self._hists.close()
        if self._tb is not None:
            self._tb.close()


def HMS(sec: float) -> str:
    """seconds -> 'Hh:MMm:SSs' (tools/utils.py:274-283)."""
    m, s = divmod(sec, 60)
    h, m = divmod(m, 60)
    return "%dh:%02dm:%02ds" % (h, m, s)


def configurationPATH(cf):
    """Print experiment paths (tools/utils.py:286-295)."""
    print("\n###########################")
    print(' > Save Path = "%s"' % cf.exp_dir)
    print("###########################\n")
