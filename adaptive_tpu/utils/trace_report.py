"""Profiling trace reports: summarize a jax.profiler trace into top-ops tables.

Completes the tracing subsystem (the reference has only wall-clock timing,
SURVEY.md §5): capture with `bench.py --profile-dir DIR` or
utils.profiling.profile_trace, then

    python -m adaptive_tpu.utils.trace_report DIR [--iters N] [--top K]

prints device time grouped by op category (conv/fusion/while/...) — the same
aggregation used to find the BN-stats and fp32-head bottlenecks recorded in
VALIDATION.md.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

_HOST_PREFIXES = ("$", "np.", "jit_", "Pjit", "program", "PythonRefManager")


def load_trace_events(trace_dir: str) -> List[dict]:
    """Find the newest .trace.json.gz under a jax.profiler trace dir."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f).get("traceEvents", [])


def device_op_summary(events: List[dict], iters: int = 1) -> List[Tuple[str, float, int]]:
    """[(category, ms_per_iter, count)] sorted by time, host events excluded.

    Categories strip trailing `.N` ids so all instances of e.g. a fused conv
    aggregate together.
    """
    # A device op shows up in several lanes of the same trace ("XLA Modules",
    # "XLA Ops", sometimes "Steps"), so summing every X event double-counts.
    # Prefer the "XLA Ops" lanes when present (thread_name metadata).
    lane_name: Dict[Tuple, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_name[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get("name", "")
    ops_lanes = {k for k, v in lane_name.items() if "XLA Ops" in v}

    agg: Dict[str, float] = defaultdict(float)
    cnt: Dict[str, int] = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if ops_lanes and (e.get("pid"), e.get("tid")) not in ops_lanes:
            continue
        name = e.get("name", "")
        if not name or any(name.startswith(p) for p in _HOST_PREFIXES):
            continue
        cat = re.sub(r"[.\d]+$", "", name) or "convolution"
        agg[cat] += e["dur"]
        cnt[cat] += 1
    return sorted(
        ((k, v / iters / 1e3, cnt[k]) for k, v in agg.items()), key=lambda t: -t[1]
    )


_DECODE_OPS = (
    "while", "iota_reduce", "closed_call", "dynamic_update_slice",
    "constant_dynamic-update-slice", "compare_or", "broadcast_in_dim",
    "convert_reduce",
)


def stage_split(events: List[dict], iters: int = 1) -> Dict[str, float]:
    """Device ms/iter per pipeline stage of the decode benchmark program.

    Classification: the 30-step decode scan and its argmax/top-k plumbing by
    op name; preprocessing by operand shapes still carrying 3 channels or the
    raw 256x256 frame; everything else (the conv stack and its quantize /
    residual epilogues) is the encoder. Heuristic by design — used for the
    bench.py --verbose breakdown, not for accounting-grade numbers.
    """
    lane_name: Dict[Tuple, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_name[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get("name", "")
    ops_lanes = {k for k, v in lane_name.items() if "XLA Ops" in v}

    out = {"preprocess_ms": 0.0, "encoder_ms": 0.0, "decode_ms": 0.0}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if ops_lanes and (e.get("pid"), e.get("tid")) not in ops_lanes:
            continue
        name = e.get("name", "")
        if not name or any(name.startswith(p) for p in _HOST_PREFIXES):
            continue
        long_name = e.get("args", {}).get("long_name", "")
        # the op's OUTPUT shape is the first [...] group ("%x = TYPE[shape]...");
        # matching the full long_name would misfile e.g. a 3x3 conv whose
        # s8[3,3,256,256] WEIGHT operand looks like a raw 256x256 frame
        lb = long_name.find("[")
        out_shape = long_name[lb : long_name.find("]", lb) + 1] if lb >= 0 else ""
        if any(name.startswith(p) for p in _DECODE_OPS):
            key = "decode_ms"
        elif out_shape.endswith(",3]") or "256,256" in out_shape:
            key = "preprocess_ms"
        else:
            key = "encoder_ms"
        out[key] += e["dur"]
    return {k: round(v / iters / 1e3, 2) for k, v in out.items()}


def format_report(summary: List[Tuple[str, float, int]], top: int = 20) -> str:
    total = sum(ms for _, ms, _ in summary)
    lines = [f"device time: {total:.1f} ms/iter", "-" * 56]
    for cat, ms, n in summary[:top]:
        lines.append(f"{ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%  x{n:<6} {cat[:40]}")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=1, help="iterations captured in the trace")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)
    events = load_trace_events(args.trace_dir)
    print(format_report(device_op_summary(events, args.iters), args.top))


if __name__ == "__main__":
    main()
