#!/usr/bin/env python
"""On-chip serving benchmark: CaptionService p50/p99 latency vs offered load.

Drives adaptive_tpu.serving.CaptionService (the subsystem the reference does
not have) against the real TPU with Poisson open-loop client traffic at a
sweep of offered QPS levels, and reports per-level latency percentiles, shed
rate, sustained throughput, and the batch-fill histogram — the evidence row
VALIDATION.md's serving section records (VERDICT r3 #3).

Rig caveat (same as bench.py --host-input): on this tunneled v5e the
host->device image upload (~196 KB/image over a bursty ~30-65 MB/s link,
~2 ms/dispatch) dominates end-to-end latency; the per-batch device decode
time is reported separately so the host-attached number is derivable.

Usage:
    python tools/serving_bench.py [--batch 32] [--qps 8,16,32,64]
        [--duration 20] [--quant int8] [--beam 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def percentile(xs, p):
    """None (JSON null) when the level completed zero requests — float('nan')
    would make json.dumps emit bare NaN, invalid JSON for line consumers."""
    if not xs:
        return None
    xs = sorted(xs)
    k = min(len(xs) - 1, max(0, int(round(p / 100.0 * (len(xs) - 1)))))
    return round(xs[k], 1)


def build_service(args):
    import jax

    from adaptive_tpu.config import load_config
    from adaptive_tpu.data.vocab import Vocabulary
    from adaptive_tpu.serving import CaptionService

    # flagship serving config: the benched decode defaults (int8 per-channel
    # carry encoder + fused Pallas decode cell) at a latency-oriented batch
    words = ["<pad>", "<start>", "<end>", "<unk>"] + [f"w{i}" for i in range(10119)]
    vocab = Vocabulary(words)
    cf = load_config(
        None,
        atten_model_name="adaptive_attention",
        encoder_backbone=args.backbone,
        vocab_length=len(vocab),
        compute_dtype="bfloat16",
        eval_batch_size=args.batch,
        beam_size=args.beam,
        encoder_quant=args.quant,
    )
    rng = np.random.default_rng(0)
    calib = (
        rng.integers(0, 255, (32, cf.resized_image_size, cf.resized_image_size, 3), np.uint8)
        if args.quant == "int8"
        else None
    )
    svc = CaptionService(
        cf, vocab, batch_size=args.batch, max_wait_ms=args.max_wait_ms,
        calibration_images=calib,
        early_exit=args.early_exit == "on",
        scan_prefix=args.scan_prefix,
    )
    t0 = time.monotonic()
    svc.warmup()
    compile_s = time.monotonic() - t0
    # device-only decode time: the jitted program on an already-uploaded batch
    img = jax.device_put(
        rng.integers(0, 255, (args.batch, cf.resized_image_size, cf.resized_image_size, 3),
                     np.uint8)
    )
    warm = svc.decode(svc.params, svc.state, img)  # warm this shape
    _ = float(np.asarray(warm.ids.sum()))  # sync: dispatch is async on this rig
    t0 = time.monotonic()
    for _ in range(5):
        out = svc.decode(svc.params, svc.state, img)
    _ = float(np.asarray(out.ids.sum()))  # reliable sync on this rig (CLAUDE.md)
    device_ms = (time.monotonic() - t0) / 5 * 1e3
    return svc, cf, compile_s, device_ms


def run_level(svc, size, qps, duration_s, seed=0):
    """Open-loop Poisson arrivals at `qps` for `duration_s`; returns stats."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (size, size, 3), np.uint8)
    lat_ms, outcomes = [], []
    lock = threading.Lock()
    threads = []

    def one_request():
        t0 = time.monotonic()
        r = svc.caption(img, timeout=30.0)
        dt = (time.monotonic() - t0) * 1e3
        with lock:
            outcomes.append(r.get("error", "ok"))
            if "error" not in r:
                lat_ms.append(dt)

    t_end = time.monotonic() + duration_s
    next_t = time.monotonic()
    n_sent = 0
    while time.monotonic() < t_end:
        next_t += rng.exponential(1.0 / qps)
        delay = next_t - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        t = threading.Thread(target=one_request, daemon=True)
        t.start()
        threads.append(t)
        n_sent += 1
    for t in threads:
        t.join(timeout=45.0)
    ok = sum(1 for o in outcomes if o == "ok")
    shed = sum(1 for o in outcomes if o == "overloaded")
    errs = len(outcomes) - ok - shed
    return {
        "offered_qps": qps,
        "sent": n_sent,
        "completed": ok,
        "shed": shed,
        "other_errors": errs,
        "goodput_qps": round(ok / duration_s, 2),
        "p50_ms": percentile(lat_ms, 50),
        "p90_ms": percentile(lat_ms, 90),
        "p99_ms": percentile(lat_ms, 99),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--backbone", default="resnet152")
    p.add_argument("--quant", default="int8", choices=["none", "int8"])
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--max-wait-ms", type=float, default=20.0)
    p.add_argument("--early-exit", default="off", choices=["on", "off"],
                   help="decode_early_exit (round-5: no measurable overhead "
                        "at any batch shape; pays on trained checkpoints — "
                        "VALIDATION.md)")
    p.add_argument("--scan-prefix", type=int, default=0,
                   help="two-phase decode: pipelined scan for the first N "
                        "steps, early-exit while_loop for the tail")
    p.add_argument("--qps", default="8,16,32,64")
    p.add_argument("--duration", type=float, default=20.0)
    args = p.parse_args()

    svc, cf, compile_s, device_ms = build_service(args)
    print(f"warmup/compile: {compile_s:.1f}s; device-only decode "
          f"{device_ms:.1f} ms/batch-{args.batch} "
          f"({args.batch / device_ms * 1e3:.0f} captions/s device ceiling)",
          flush=True)
    levels = []
    try:
        for qps in [float(q) for q in args.qps.split(",")]:
            lv = run_level(svc, cf.resized_image_size, qps, args.duration)
            print(json.dumps(lv), flush=True)
            levels.append(lv)
        stats = svc.stats()
    finally:
        svc.close()
    print(json.dumps({
        "metric": "serving_sweep",
        "batch": args.batch,
        "quant": args.quant,
        "beam": args.beam,
        "max_wait_ms": args.max_wait_ms,
        "device_decode_ms": round(device_ms, 1),
        "levels": levels,
        "batch_fill_hist": stats["batch_fill_hist"],
        "latency_ms_hist": stats["latency_ms_hist"],
    }))


if __name__ == "__main__":
    main()
