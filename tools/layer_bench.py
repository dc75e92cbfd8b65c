#!/usr/bin/env python
"""Per-layer int8 encoder microbenchmark on the real chip.

Times every distinct conv shape of the ResNet-152 @224 int8 inference path
(models/infer.py::_conv_i8 with static scales) plus an empirical int8-matmul
peak, and prints a table: per-shape ms, total ms weighted by occurrence
count, achieved TOPS, and % of the measured matmul peak.

Methodology: this rig dispatches through a tunnel with a ~2 ms fixed
per-execute overhead, so each timed op runs `--inner` times INSIDE one
program via lax.fori_loop with a scalar data dependency between iterations
(s*0 added to the input defeats CSE without measurable extra traffic), and
the overhead amortizes to noise.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/layer_bench.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x))


# (name, Cin, HW_in, Cout, k, stride, count) — ResNet-152 @ 224 eval crop.
# HW_in is the spatial size of the conv INPUT.
RESNET152_CONVS = [
    ("conv1", 3, 224, 64, 7, 2, 1),
    ("l1.c1a", 64, 56, 64, 1, 1, 1),
    ("l1.c1b", 256, 56, 64, 1, 1, 2),
    ("l1.c2", 64, 56, 64, 3, 1, 3),
    ("l1.c3", 64, 56, 256, 1, 1, 3),
    ("l1.ds", 64, 56, 256, 1, 1, 1),
    ("l2.c1a", 256, 56, 128, 1, 1, 1),
    ("l2.c1b", 512, 28, 128, 1, 1, 7),
    ("l2.c2a", 128, 56, 128, 3, 2, 1),
    ("l2.c2b", 128, 28, 128, 3, 1, 7),
    ("l2.c3", 128, 28, 512, 1, 1, 8),
    ("l2.ds", 256, 56, 512, 1, 2, 1),
    ("l3.c1a", 512, 28, 256, 1, 1, 1),
    ("l3.c1b", 1024, 14, 256, 1, 1, 35),
    ("l3.c2a", 256, 28, 256, 3, 2, 1),
    ("l3.c2b", 256, 14, 256, 3, 1, 35),
    ("l3.c3", 256, 14, 1024, 1, 1, 36),
    ("l3.ds", 512, 28, 1024, 1, 2, 1),
    ("l4.c1a", 1024, 14, 512, 1, 1, 1),
    ("l4.c1b", 2048, 7, 512, 1, 1, 2),
    ("l4.c2a", 512, 14, 512, 3, 2, 1),
    ("l4.c2b", 512, 7, 512, 3, 1, 2),
    ("l4.c3", 512, 7, 2048, 1, 1, 3),
    ("l4.ds", 1024, 14, 2048, 1, 2, 1),
]


def make_looped(op, inner):
    """One jitted program running `op(x, params)` `inner` times with a scalar
    dependency chaining iterations (per-dispatch overhead amortized away)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, params):
        def body(_, carry):
            x, acc = carry
            y = op(x, params)
            s = jnp.sum(y.astype(jnp.float32))
            return (x + (s * 0).astype(x.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, inner, body, (x, jnp.float32(0)))
        return acc

    return run


def time_looped(run, x, params, inner, reps=3):
    _sync(run(x, params))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(x, params)
        _sync(r)
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--inner", type=int, default=24)
    p.add_argument("--json", default="")
    p.add_argument("--impl", default="xla", choices=["xla"],
                   help="conv implementation to time (standalone Pallas convs "
                   "measured as net losses — VALIDATION.md round-3 ladders)")
    p.add_argument("--only", default="", help="comma-separated layer-name filter")
    args = p.parse_args()

    import jax.numpy as jnp

    from adaptive_tpu.models.infer import _conv_i8

    rng = np.random.default_rng(0)

    # ---- empirical int8 matmul peak -----------------------------------
    peaks = {}
    for (m, k, n) in [(32768, 1024, 1024), (8192, 2048, 2048)]:
        a = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        b = {"w": jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))}

        def mm(a, p):
            import jax

            return jax.lax.dot_general(
                a, p["w"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )

        dt = time_looped(make_looped(mm, args.inner), a, b, args.inner)
        tops = 2 * m * k * n / dt / 1e12
        peaks[f"{m}x{k}x{n}"] = round(tops, 1)
        print(f"int8 matmul {m}x{k}x{n}: {dt*1e3:.3f} ms  {tops:.1f} TOPS", flush=True)
    peak_tops = max(peaks.values())

    # ---- per-layer conv timings ---------------------------------------
    B = args.batch
    rows = []
    total = 0.0
    conv_fn = _conv_i8

    only = set(args.only.split(",")) if args.only else None
    for (name, cin, hw, cout, k, stride, count) in RESNET152_CONVS:
        if only and name not in only:
            continue
        x = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin)).astype(np.float32), dtype=jnp.bfloat16
        )
        kern = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05)
        bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        params = {"kernel": kern, "bias": bias}
        pad = [(3, 3), (3, 3)] if k == 7 else None

        def conv(x, params, _s=stride, _p=pad):
            return conv_fn(x, params, _s, jnp.bfloat16, 0.05, _p)

        inner = max(4, args.inner // 4) if hw >= 56 else args.inner
        dt = time_looped(make_looped(conv, inner), x, params, inner)
        hw_out = hw // stride
        macs = B * hw_out * hw_out * cin * cout * k * k
        tops = 2 * macs / dt / 1e12
        gbytes = (B * hw * hw * cin * 2 + B * hw_out * hw_out * cout * 2 + k * k * cin * cout) / 1e9
        rows.append({
            "name": name, "count": count, "ms": round(dt * 1e3, 3),
            "total_ms": round(dt * 1e3 * count, 2), "tops": round(tops, 1),
            "pct_peak": round(100 * tops / peak_tops, 1),
            "gb_s": round(gbytes / dt, 1),
        })
        total += dt * count
        print(f"{name:8s} x{count:2d}  {dt*1e3:7.3f} ms  -> {dt*1e3*count:7.2f} ms total  "
              f"{tops:6.1f} TOPS ({100*tops/peak_tops:4.1f}% peak)  {gbytes/dt:6.0f} GB/s",
              flush=True)

    print(f"\nTOTAL encoder conv time: {total*1e3:.1f} ms (batch {B})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"peak_tops": peaks, "batch": B, "rows": rows,
                       "total_ms": round(total * 1e3, 1)}, f, indent=1)


if __name__ == "__main__":
    main()
