#!/usr/bin/env python
"""Benchmark: captions/sec for the full inference pipeline on one TPU chip.

Measures the headline metric from BASELINE.md — batched greedy decoding over
COCO-shaped inputs: on-device preprocess (resize 256->224 + normalize) +
BN-folded int8-PTQ ResNet-152 encoder + 30-step fused-scan bf16
adaptive-attention decoder. Steady-state on-device throughput: inputs are
device-resident and N dispatches queue back-to-back with one final sync, so
the number reflects the framework/chip, not this test rig's host tunnel
(whose ~65 MB/s upload path would otherwise dominate; production input
pipelines overlap host IO).

The default is the fastest *quality-validated* config: int8 encoder PTQ is
gated by tests/test_pipeline.py::test_int8_quality_gate (CIDEr delta < 0.01
vs bf16 on a trained model). `--quant none` gives the exact-math bf16 mode.

Prints ONE JSON line:
{"metric": "captions_per_sec", "value": N, "unit": "captions/s", "vs_baseline": N/5000}
(baseline: the driver's >=5k captions/s on v5e-8 target, i.e. 625/chip).

Extra modes (each still prints one JSON line):
* --mode train         — full training step (fwd+bwd+dual-opt+aug) img/s;
                         --encoder-off benches the pre-fine-tune phase
                         (epochs < opt_fine_tune_cnn_start_epoch), where the
                         conv backward is dead code (training/step.py).
* --host-input         — stream distinct uint8 batches from host RAM through
                         data.loader.device_prefetch instead of reusing a
                         device-resident batch: the deployable end-to-end
                         number. Also reports the measured one-way upload and
                         device-only times and the overlap efficiency
                         (serial_time / pipelined_time; 1.0 = no overlap;
                         serial/max(parts) = perfect upload/compute overlap;
                         higher still means device_prefetch had several
                         uploads in flight at once).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x) -> float:
    # np.asarray on a scalar is the only reliable device sync on this rig
    # (block_until_ready returns early through the axon tunnel), CLAUDE.md.
    # Non-scalars reduce ON DEVICE first: a 4-byte fetch instead of dragging
    # the array over the ~3 MB/s download path.
    if getattr(x, "ndim", 0):
        x = x.sum()
    return float(np.asarray(x))


def _load_images_dir(path, batch, size=256):
    """Load up to `batch` images from a directory (PIL), resized to the
    pipeline's offline-resize shape (size x size LANCZOS, like the resize
    stage) and tiled to the batch — real content so a --checkpoint bench
    gets the trained model's actual caption-length/exit behavior, not
    noise-input behavior. Resizing here also handles raw COCO directories,
    whose images have heterogeneous shapes."""
    import glob as g
    import os

    from PIL import Image

    from adaptive_tpu.data.resize import resize_image

    files = sorted(
        f for f in g.glob(os.path.join(path, "**", "*"), recursive=True)
        if f.lower().endswith((".jpg", ".jpeg", ".png")) and os.path.isfile(f)
    )[:batch]
    if not files:
        raise FileNotFoundError(f"no images under {path}")

    def load(f):
        with Image.open(f) as im:
            im = im.convert("RGB")
            if im.size != (size, size):
                im = resize_image(im, (size, size))
            return np.asarray(im)

    imgs = np.stack([load(f) for f in files])
    reps = -(-batch // len(imgs))
    return np.tile(imgs, (reps, 1, 1, 1))[:batch].astype(np.uint8)


def _checkpoint_vocab(path):
    """(vocab_length, vocab_pad_multiple) for a checkpoint.

    The embed table's row count is the PADDED vocab (configs ship
    vocab_pad_multiple=128: 10123 -> 10240), and the pad rows keep their
    random init (zero gradient under the decode-time NEG_INF mask) — so
    building the bench model with vocab_length=rows would disable that mask
    and let 117 junk rows compete in argmax/top_k, distorting exactly the
    trained-caption behavior a --checkpoint bench measures. manifest.json's
    vocab_length (recorded by train_loop's resume_meta) is authoritative;
    pad_multiple=rows reproduces any padded table (ceil(v/rows)*rows == rows
    whenever v <= rows). Checkpoints predating the manifest field fall back
    to the old rows-as-vocab read, loudly."""
    import json
    import os

    npz = path if path.endswith(".npz") else os.path.join(path, "model.npz")
    with np.load(npz) as z:
        rows = int(z["params|decoder|embed"].shape[0])
    manifest = os.path.join(os.path.dirname(npz), "manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            v = json.load(f).get("vocab_length")
        if v and int(v) <= rows:
            v = int(v)
            return v, (rows if rows != v else 1)
    print(
        f"WARNING: {manifest} lacks vocab_length; treating all {rows} embed "
        "rows (incl. any pad rows) as real vocabulary"
    )
    return rows, 1


def _make_decode_step(args):
    import jax
    import jax.numpy as jnp

    from adaptive_tpu.config import load_config
    from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder
    from adaptive_tpu.models.factory import build_model

    vocab_len, vocab_pad = (
        _checkpoint_vocab(args.checkpoint) if args.checkpoint else (10123, 1)
    )
    cf = load_config(None,
        atten_model_name="adaptive_attention",
        encoder_backbone=args.backbone,
        vocab_length=vocab_len,
        vocab_pad_multiple=vocab_pad,
        compute_dtype=args.dtype,
        eval_batch_size=args.batch,
        beam_size=args.beam,
        decode_beam_major=args.beam_major == "on",
        decode_early_exit=args.early_exit == "on",
        decode_scan_prefix=args.scan_prefix,
        **({"decode_eos_token": args.eos_token} if args.eos_token >= 0 else {}),
        use_pallas=args.use_pallas,
        encoder_quant=args.quant,
        encoder_quant_granularity=args.quant_granularity,
    )
    model = build_model(cf)
    if args.fused_blocks != "auto":
        fb = () if args.fused_blocks == "none" else tuple(args.fused_blocks.split(","))
        model = model._replace(int8_fused_layers=fb)
    if args.fused_tails != "auto":
        ft = () if args.fused_tails == "none" else tuple(args.fused_tails.split(","))
        model = model._replace(int8_fused_tails=ft)
    if args.stem_s2d != "auto":
        model = model._replace(int8_stem_s2d=args.stem_s2d == "on")
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.checkpoint:
        # bench a TRAINED model (e.g. the int8-gate checkpoint or a real-COCO
        # run): restored weights change decode behavior — notably how early
        # captions hit <end>, which --early-exit converts into throughput
        from adaptive_tpu.training.checkpoint import restore_model

        params, state = restore_model(args.checkpoint, params, state)

    images = jax.device_put(
        _load_images_dir(args.images_dir, args.batch) if args.images_dir else
        np.random.default_rng(0).integers(0, 255, (args.batch, 256, 256, 3), dtype=np.uint8)
    )

    if args.quant == "int8":
        # static PTQ scales: calibrate once on a slice, bake as constants
        from adaptive_tpu.models.infer import calibrate_model

        model = calibrate_model(model, cf, params, state, images[: min(32, args.batch)])

    decode = (
        make_beam_decoder(model, cf) if args.beam > 1 else make_greedy_decoder(model, cf)
    )

    # decode is called eagerly (NOT wrapped in an outer jit) so its
    # per-checkpoint weight prep (decoding/greedy.py::prepare_cached) runs
    # once, not per batch. ONE dispatch per timed iteration: the returned
    # ids array is the sync handle (_sync reduces it on device — the
    # reduction dispatch happens once at sync time, not per iter).
    def step(imgs):
        return decode(params, state, imgs).ids

    return step, images


def _make_train_step(args):
    import jax

    if getattr(args, "conv_bwd_quant", "none") != "none":
        from adaptive_tpu.ops.quant_conv import set_conv_bwd_quant

        set_conv_bwd_quant(args.conv_bwd_quant)  # trace-time switch

    from adaptive_tpu.config import load_config
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = load_config(None,
        atten_model_name="adaptive_attention",
        encoder_backbone=args.backbone,
        vocab_length=10123,
        compute_dtype=args.dtype,
        train_batch_size=args.batch,
        train_grad_accum_steps=args.grad_accum,
        opt_rnn_optimization=args.decoder_opt,
    )
    model = build_model(cf)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    dual, opt_state = make_dual_optimizer(params, cf)
    if dual.decoder_is_lbfgs or dual.encoder_is_lbfgs:
        # the reference's closure optimizer (train.py:197-219): each step runs
        # opt_rnn_lbfgs_max_iter inner loss re-evaluations on the batch
        from adaptive_tpu.training.lbfgs import make_lbfgs_train_step

        train_step = make_lbfgs_train_step(model, dual, cf)
    else:
        train_step = make_train_step(model, dual, cf)
    rng = jax.random.PRNGKey(1)
    carry = {"params": params, "state": state, "opt": opt_state}

    def step(batch):
        out = train_step(
            carry["params"], carry["state"], carry["opt"],
            batch, rng, encoder_on=not args.encoder_off,
        )
        carry["params"], carry["state"], carry["opt"] = (
            out.params, out.model_state, out.opt_state,
        )
        return out.loss

    def make_host_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "images": r.integers(0, 255, (args.batch, 256, 256, 3), dtype=np.uint8),
            "captions": r.integers(1, 10000, (args.batch, args.seq_len), dtype=np.int32),
            "lengths": np.full((args.batch,), args.seq_len, np.int32),
        }

    return step, make_host_batch


def _bench_device_resident(step, batch, iters, profile_dir=""):
    """N queued dispatches, one final sync (the chip-ceiling methodology).

    Compile+warm runs BEFORE the profiler window so a --profile-dir trace
    contains only steady-state device steps, not the multi-minute remote
    compile (which would drown the trace in host-side tracing frames)."""
    from adaptive_tpu.utils.profiling import profile_trace

    _sync(step(batch))  # compile + warm (outside any profiling)
    with profile_trace(profile_dir, enabled=bool(profile_dir)):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = step(batch)
        _sync(r)
        dt = (time.perf_counter() - t0) / iters
    return dt


def _bench_host_input(step, host_batches, prefetch):
    """Sustained pipelined throughput: distinct host batches streamed through
    device_prefetch (async device_put overlapping compute).

    Returns (seconds/batch pipelined, seconds/batch upload-only,
    seconds/batch device-only)."""
    import jax

    from adaptive_tpu.data.loader import device_prefetch

    as_tree = lambda b: b if isinstance(b, dict) else {"images": b}
    tree_of = lambda d: d if len(d) > 1 else d["images"]

    # compile + warm with one batch
    warm = {k: jax.device_put(v) for k, v in as_tree(host_batches[0]).items()}
    _sync(step(tree_of(warm)))

    # upload-only cost (synchronous device_put of one batch); sync by fetching
    # one element of each uploaded buffer (block_until_ready returns early
    # through the axon tunnel, and a full-array fetch would ride the slow
    # download path)
    times = []
    for i in range(3):  # median of 3: the tunnel's rate is bursty
        t0 = time.perf_counter()
        up = {k: jax.device_put(v) for k, v in as_tree(host_batches[i % len(host_batches)]).items()}
        for v in up.values():
            _sync(v[(0,) * v.ndim].astype(np.float32))
        times.append(time.perf_counter() - t0)
    t_upload = sorted(times)[1]

    # device-only cost (reuse the uploaded batch)
    t0 = time.perf_counter()
    for _ in range(4):
        r = step(tree_of(up))
    _sync(r)
    t_device = (time.perf_counter() - t0) / 4

    # pipelined end-to-end
    t0 = time.perf_counter()
    r = None
    for dev_batch in device_prefetch(iter(map(as_tree, host_batches)), size=prefetch):
        r = step(tree_of(dev_batch))
    _sync(r)
    t_pipe = (time.perf_counter() - t0) / len(host_batches)
    return t_pipe, t_upload, t_device


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="decode", choices=["decode", "train"])
    p.add_argument("--batch", type=int, default=0, help="default: 1024 decode / 256 train")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--backbone", default="resnet152")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--beam-major", default="on", choices=["on", "off"],
                   help="beam>1: share V/pv across beam rows in the fused cell "
                        "(decode_beam_major); 'off' is the tiled-layout escape hatch")
    p.add_argument("--early-exit", default="off", choices=["on", "off"],
                   help="decode: stop the loop once every row/beam emitted <end> "
                        "(decode_early_exit); default off = the reference's "
                        "fixed-30 step count")
    p.add_argument("--scan-prefix", type=int, default=0,
                   help="with --early-exit on: run the first N steps as a "
                        "pipelined fixed scan, while_loop only the tail "
                        "(decode_scan_prefix; two-phase decode)")
    p.add_argument("--eos-token", type=int, default=-1,
                   help="override decode_eos_token (measurement harness for "
                        "--early-exit: point it at the untrained model's "
                        "attractor token to synthesize a short-caption "
                        "distribution; see VALIDATION.md)")
    p.add_argument("--checkpoint", default="",
                   help="decode mode: bench a trained checkpoint dir (vocab "
                        "size auto-detected from its embed table) instead of "
                        "random-init weights")
    p.add_argument("--images-dir", default="",
                   help="decode mode: load real images (tiled to the batch) "
                        "instead of random uint8 — pair with --checkpoint so "
                        "--early-exit sees the trained caption lengths")
    p.add_argument("--use-pallas", default="auto")
    p.add_argument("--quant", default="int8", help="encoder quantization: none|int8")
    p.add_argument("--quant-granularity", default="channel", choices=["channel", "tensor"],
                   help="int8 activation-scale granularity (channel folds "
                        "per-channel scales into the kernels, models/infer.py)")
    p.add_argument("--fused-blocks", default="auto",
                   help="int8 fused Pallas block layers: auto|none|layer1,layer2,...")
    p.add_argument("--fused-tails", default="auto",
                   help="int8 fused tail+conv1 layers: auto|none|layer1,layer2,...")
    p.add_argument("--stem-s2d", default="auto", choices=["auto", "on", "off"],
                   help="int8 space-to-depth stem (bit-exact 7x7/s2 -> 4x4/s1)")
    p.add_argument("--decoder-opt", default="adam", choices=["adam", "sgd", "lbfgs"],
                   help="train mode: decoder optimizer group (lbfgs benches the "
                        "closure step, train.py:197-219 parity)")
    p.add_argument("--encoder-off", action="store_true",
                   help="train mode: bench the pre-fine-tune phase (no conv bwd)")
    p.add_argument("--seq-len", type=int, default=24, help="train mode caption bucket")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="train mode: microbatches per step (exact full-batch grad)")
    p.add_argument("--conv-bwd-quant", default="none", choices=["none", "manual", "int8"],
                   help="train mode EXPERIMENT: quantize the stride-1 conv backward "
                        "contractions (ops/quant_conv.py); quality-unvalidated")
    p.add_argument("--host-input", action="store_true",
                   help="stream uint8 batches from host RAM via device_prefetch")
    p.add_argument("--prefetch", type=int, default=2, help="device_prefetch depth")
    p.add_argument("--profile-dir", default="", help="write a jax.profiler trace here")
    p.add_argument("--verbose", action="store_true",
                   help="decode mode: add per-stage breakdown (preprocess/encoder/"
                        "decode ms + encoder MXU%%) to the JSON line via a trace capture")
    args = p.parse_args()
    if not args.batch:
        # Per-mode sweet spots, each measured on v5e (VALIDATION.md):
        # * int8 decode 2048: best once the decode scan's in-loop pad/tile
        #   rematerialization was hoisted (9,107 vs 8,885 at 1024 vs 8,455
        #   at 4096) — before that fix, >1024 lost.
        # * bf16 (--quant none) decode 512: its working set is ~2x int8's,
        #   so int8's 2048 regresses it (5,601 at 512 vs 4,727 at 2048) —
        #   auto-selected here so the exact-math mode benches at ITS best.
        if args.mode == "decode":
            args.batch = 2048 if args.quant == "int8" else 512
        else:
            args.batch = 256

    from adaptive_tpu.utils.profiling import profile_trace

    extra = {}
    if args.mode == "decode":
        step, images = _make_decode_step(args)
        if args.host_input:
            rng = np.random.default_rng(0)
            hbs = [rng.integers(0, 255, (args.batch, 256, 256, 3), dtype=np.uint8)
                   for _ in range(args.iters)]
            with profile_trace(args.profile_dir, enabled=bool(args.profile_dir)):
                dt, t_up, t_dev = _bench_host_input(step, hbs, args.prefetch)
            metric = "captions_per_sec_host_input"
        else:
            dt = _bench_device_resident(step, images, args.iters)
            bench_input = images
            metric = "captions_per_sec"
        unit, anchor = "captions/s", 5000.0
    else:
        step, make_host_batch = _make_train_step(args)
        if args.host_input:
            hbs = [make_host_batch(i) for i in range(args.iters)]
            with profile_trace(args.profile_dir, enabled=bool(args.profile_dir)):
                dt, t_up, t_dev = _bench_host_input(step, hbs, args.prefetch)
            metric = "images_per_sec_train_host_input"
        else:
            import jax

            batch = {k: jax.device_put(v) for k, v in make_host_batch(0).items()}
            dt = _bench_device_resident(step, batch, args.iters)
            bench_input = batch
            metric = "images_per_sec_train"
        # anchor: round-1 recorded fine-tune train step (VALIDATION.md)
        unit, anchor = "img/s", 1310.0

    if args.host_input:
        serial = t_up + t_dev
        extra = {
            "upload_ms": round(t_up * 1e3, 1),
            "device_ms": round(t_dev * 1e3, 1),
            # 1.0 = fully serial; serial/max(parts) = perfect overlap
            "overlap_efficiency": round(serial / dt, 3),
            "overlap_max": round(serial / max(t_up, t_dev), 3),
        }

    # Tracing runs as a SEPARATE short pass so the headline number above is
    # never measured under profiler overhead (the recorded BENCH_r* numbers
    # are tracing-free; a --verbose rerun must be comparable to them).
    want_trace = not args.host_input and (
        args.profile_dir or (args.verbose and args.mode == "decode")
    )
    if want_trace:
        trace_dir, auto_trace = args.profile_dir, False
        if not trace_dir:
            import tempfile

            trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
            auto_trace = True
        trace_iters = min(args.iters, 10)
        _bench_device_resident(step, bench_input, trace_iters, trace_dir)
        if args.profile_dir:
            # trace_report needs the trace pass's iteration count, not --iters
            extra["trace_iters"] = trace_iters
        if args.verbose and args.mode == "decode":
            from adaptive_tpu.utils.trace_report import load_trace_events, stage_split

            try:
                stages = stage_split(load_trace_events(trace_dir), trace_iters)
                macs = _encoder_macs(args.backbone, 224) * args.batch
                peak_tops = 394.0 if args.quant == "int8" else 197.0  # v5e chip peaks
                if stages.get("encoder_ms"):
                    tops = 2 * macs / (stages["encoder_ms"] / 1e3) / 1e12
                    stages["encoder_tops"] = round(tops, 1)
                    stages["encoder_mxu_pct"] = round(100 * tops / peak_tops, 1)
                extra.update(stages)
            except Exception as e:  # breakdown is best-effort; never break the contract
                extra["stage_split_error"] = f"{type(e).__name__}: {e}"
        if auto_trace:
            import shutil

            shutil.rmtree(trace_dir, ignore_errors=True)

    rate = args.batch / dt
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 2),
        "unit": unit,
        "vs_baseline": round(rate / anchor, 4),
        **extra,
    }))


def _encoder_macs(arch: str, crop: int) -> int:
    """Conv MACs of one image through the resnet backbone (for MXU%)."""
    from adaptive_tpu.models.resnet import RESNET_SPECS

    block_type, stages = RESNET_SPECS[arch]
    hw = crop // 2  # conv1 stride 2
    total = hw * hw * 7 * 7 * 3 * 64
    hw //= 2  # maxpool
    cin = 64
    width = 64
    for li, n_blocks in enumerate(stages):
        width = 64 * (2 ** li)
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            out_hw = hw // stride
            if block_type == "bottleneck":
                cout = width * 4
                total += hw * hw * cin * width            # conv1 1x1 (pre-stride)
                total += out_hw * out_hw * 9 * width * width   # conv2 3x3 (strided)
                total += out_hw * out_hw * width * cout   # conv3 1x1
                if bi == 0:
                    total += out_hw * out_hw * cin * cout  # downsample
            else:
                cout = width
                total += out_hw * out_hw * 9 * cin * width
                total += out_hw * out_hw * 9 * width * width
                if bi == 0 and (li > 0 or cin != cout):
                    total += out_hw * out_hw * cin * cout
            cin = cout
            hw = out_hw
    return total


if __name__ == "__main__":
    main()
