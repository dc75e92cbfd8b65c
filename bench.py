#!/usr/bin/env python
"""Benchmark: captions/sec for the full inference pipeline on one TPU chip.

Measures the headline metric from BASELINE.md — batched greedy decoding
(on-device preprocess + ResNet-152 encoder + 30-step fused scan decoder) on
COCO-shaped inputs, bfloat16 compute. Prints ONE JSON line:
{"metric": "captions_per_sec", "value": N, "unit": "captions/s", "vs_baseline": N/5000}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--backbone", default="resnet152")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--beam", type=int, default=1)
    args = p.parse_args()

    import jax

    from adaptive_tpu.config import Config
    from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder
    from adaptive_tpu.models.factory import build_model

    cf = Config(
        atten_model_name="adaptive_attention",
        encoder_backbone=args.backbone,
        vocab_length=10123,
        compute_dtype=args.dtype,
        eval_batch_size=args.batch,
        beam_size=args.beam,
    )
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    decode = (
        make_beam_decoder(model, cf) if args.beam > 1 else make_greedy_decoder(model, cf)
    )

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (args.batch, 256, 256, 3), dtype=np.uint8)

    # warmup/compile
    for _ in range(args.warmup):
        out = decode(params, state, images)
        jax.block_until_ready(out.ids)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = decode(params, state, images)
        jax.block_until_ready(out.ids)
        times.append(time.perf_counter() - t0)

    best = min(times)
    cps = args.batch / best
    print(
        json.dumps(
            {
                "metric": "captions_per_sec",
                "value": round(cps, 2),
                "unit": "captions/s",
                "vs_baseline": round(cps / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
