"""Serving: a production-shaped captioning service with request batching.

The reference has no serving story (eval-batch decoding only); this module
packages the inference fast path for deployment: one process owns the model,
requests are micro-batched to a fixed shape (static-shape executable reuse),
and decode runs the same jitted greedy/beam pipeline as eval. A tiny stdlib
HTTP front end lives in examples/serve.py.

Design notes (TPU):
* fixed batch: requests pad up to `batch_size` (one compiled program); the
  fill ratio is the latency/throughput dial.
* micro-batching window: the service waits up to `max_wait_ms` to fill a
  batch, then pads with the last image — p50 latency stays near one decode.
* everything device-side persists (params, BN-folded weights fold per call
  inside the jit; weights stay resident in HBM).

Hardening surface:
* input validation returns an error dict (never raises into the caller's
  thread, never crashes the worker).
* bounded queue (`max_queue`, default 8x batch): when full, requests are
  shed immediately with {"error": "overloaded"} instead of building an
  unbounded latency tail.
* `healthy()` (worker thread alive) / `ready()` (warmed: first batch
  compiled) back the /healthz and /readyz endpoints.
* `stats()`: request/shed/error counters plus latency and batch-fill
  histograms — the fill histogram is the dial for tuning max_wait_ms.
"""

from __future__ import annotations

import bisect
import queue
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

# log-spaced latency buckets, milliseconds (upper edges; last is +inf)
_LAT_EDGES_MS = (1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 2000, 5000)


class CaptionService:
    """Thread-safe micro-batching captioner.

    caption(image_u8 [S,S,3]) -> (caption str, beta list) — blocks until the
    batched decode completes.
    """

    def __init__(self, cf, vocab, params=None, state=None, checkpoint: str = "",
                 batch_size: Optional[int] = None, max_wait_ms: float = 5.0,
                 max_queue: Optional[int] = None,
                 calibration_images: Optional[np.ndarray] = None,
                 early_exit: Optional[bool] = None,
                 scan_prefix: Optional[int] = None):
        import jax

        from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder
        from adaptive_tpu.models.factory import build_model

        self.vocab = vocab
        # early_exit=True swaps the fixed-30 decode scan for a while_loop
        # that stops when every row has emitted <end> (identical outputs —
        # tests/test_decoding.py pins bit-equality). Measured safe at every
        # batch shape (round-5 VALIDATION: worst-case overhead is within
        # trace noise at batch 32 and 2048 alike — the round-4 "+50% at
        # batch 32" was the pre-pad-hoist program) and it pays on trained
        # checkpoints (+2.2% greedy to +15.3% beam-5). Default follows the
        # config's decode_early_exit (off for reference step-count parity);
        # production deployments decoding trained models should enable it.
        # early_exit=None keeps the config's own decode_early_exit (an
        # explicitly-configured knob must not be silently overwritten).
        # scan_prefix (decode_scan_prefix) runs the first N steps as a
        # fixed scan with only the tail under the while_loop — an escape
        # hatch kept from when the while path had a small-batch penalty;
        # no measured shape needs it today (VALIDATION.md round-5).
        if early_exit is None:
            early_exit = bool(getattr(cf, "decode_early_exit", False))
        if scan_prefix is None:
            scan_prefix = int(getattr(cf, "decode_scan_prefix", 0))
        self.cf = cf.replace(vocab_length=len(vocab),
                             decode_early_exit=early_exit,
                             decode_scan_prefix=scan_prefix)
        self.batch_size = batch_size or cf.eval_batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.image_size = self.cf.resized_image_size
        self.model = build_model(self.cf)
        if params is None:
            params, state = jax.jit(self.model.init)(jax.random.PRNGKey(cf.train_random_seed))
            if checkpoint:
                from adaptive_tpu.training import checkpoint as ckpt

                params, state = ckpt.restore_model(checkpoint, params, state)
        self.params, self.state = params, state
        if self.cf.encoder_quant == "int8":
            # static PTQ needs representative data; refusing beats silently
            # serving with garbage scales from zeros (quality gate is on the
            # calibration set: tests/test_int8.py).
            if calibration_images is None:
                raise ValueError(
                    "encoder_quant='int8' requires calibration_images "
                    "(uint8 [N,S,S,3], a representative sample)"
                )
            from adaptive_tpu.models.infer import calibrate_model

            self.model = calibrate_model(
                self.model, self.cf, params, state, calibration_images
            )
        self.decode = (
            make_beam_decoder(self.model, self.cf)
            if self.cf.beam_size > 1
            else make_greedy_decoder(self.model, self.cf)
        )
        # each entry: (image, t_enqueue, reply_queue, flags) — flags is a
        # {"abandoned": bool, "claimed": bool} cell mutated ONLY under
        # self._lock, so exactly one of caller-timeout / worker-delivery
        # claims a request (keeps requests == completed+errors+shed+invalid+
        # timeouts exact even when delivery races the caller's deadline).
        self._queue: "queue.Queue[Tuple[np.ndarray, float, queue.Queue, Dict]]" = queue.Queue(
            maxsize=max_queue if max_queue is not None else 8 * self.batch_size
        )
        self._stop = threading.Event()
        self._ready = threading.Event()
        self._lock = threading.Lock()
        self._counters = {"requests": 0, "completed": 0, "errors": 0,
                          "shed": 0, "invalid": 0, "batches": 0, "timeouts": 0}
        self._lat_hist = [0] * (len(_LAT_EDGES_MS) + 1)
        self._fill_hist = [0] * (self.batch_size + 1)  # index = requests in batch
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ api
    def caption(self, image_u8: np.ndarray, timeout: Optional[float] = 60.0) -> Dict:
        with self._lock:
            self._counters["requests"] += 1
        err = self._validate(image_u8)
        if err:
            with self._lock:
                self._counters["invalid"] += 1
            return {"error": err}
        if self._stop.is_set():
            with self._lock:  # counted so the counter identity still holds
                self._counters["errors"] += 1
            return {"error": "service closed"}
        reply: "queue.Queue" = queue.Queue(1)
        flags = {"abandoned": False, "claimed": False}
        try:
            self._queue.put_nowait((image_u8, time.monotonic(), reply, flags))
        except queue.Full:
            with self._lock:
                self._counters["shed"] += 1
            return {"error": "overloaded", "queue_depth": self._queue.qsize()}
        if self._stop.is_set():
            # close() may have set _stop and drained the queue BETWEEN the
            # pre-enqueue check and our put: nobody would ever service this
            # request. Abandon it under the lock (claim-once: if the worker
            # or the drain already claimed it, a reply is coming — fall
            # through to the normal wait).
            with self._lock:
                if not flags["claimed"]:
                    flags["abandoned"] = True
                    self._counters["errors"] += 1
                    return {"error": "service closed"}
        try:
            return reply.get(timeout=timeout)
        except queue.Empty:
            # Errors come back as dicts, never as exceptions into the caller's
            # thread. The abandoned flag tells the worker to skip the
            # (reader-less) reply and count the request under 'timeouts' only,
            # never 'completed'/'errors'. The claim is atomic under _lock: if
            # the worker claimed delivery in the race window, wait it out —
            # the reply is already in flight and must not be double-counted.
            with self._lock:
                if not flags["claimed"]:
                    flags["abandoned"] = True
                    self._counters["timeouts"] += 1
                    return {"error": "timeout", "timeout_s": timeout}
            return reply.get()  # claimed: put happens right after the claim

    def warmup(self):
        img = np.zeros((self.image_size,) * 2 + (3,), np.uint8)
        self.caption(img, timeout=None)  # first call compiles

    def healthy(self) -> bool:
        """Liveness: the batching worker is running."""
        return self._worker.is_alive() and not self._stop.is_set()

    def ready(self) -> bool:
        """Readiness: at least one batch decoded (executable compiled)."""
        return self.healthy() and self._ready.is_set()

    def stats(self) -> Dict:
        """Counters + histograms snapshot (all plain ints; JSON-safe).

        prepare_cache_{hits,misses}: the per-checkpoint inference-weight prep
        is memoized on (params, state) object identity (decoding/greedy.py::
        prepare_cached). Steady-state serving should show misses == 1; a
        miss per batch means a caller is rebuilding an identical params
        pytree each request and silently re-paying the ~8 ms weight prep —
        observable here instead of a hidden throughput tax."""
        prep = getattr(self.decode, "prepare", None)
        with self._lock:
            return {
                **self._counters,
                "prepare_cache_hits": getattr(prep, "hits", 0),
                "prepare_cache_misses": getattr(prep, "misses", 0),
                "queue_depth": self._queue.qsize(),
                "batch_size": self.batch_size,
                "latency_ms_hist": {
                    **{f"le_{e}": c for e, c in zip(_LAT_EDGES_MS, self._lat_hist)},
                    "inf": self._lat_hist[-1],
                },
                "batch_fill_hist": {
                    str(n): c for n, c in enumerate(self._fill_hist) if n
                },
            }

    def close(self):
        """Stop the worker and fail any queued/in-flight requests."""
        self._stop.set()
        self._worker.join(timeout=10)
        while True:  # drain: callers must not block forever
            try:
                _, _, reply, flags = self._queue.get_nowait()
            except queue.Empty:
                break
            with self._lock:
                if flags["abandoned"]:
                    continue
                flags["claimed"] = True
                self._counters["errors"] += 1
            reply.put({"error": "service closed"})

    # ------------------------------------------------------------- internals
    def _validate(self, img) -> str:
        if not isinstance(img, np.ndarray):
            return f"image must be a numpy array, got {type(img).__name__}"
        if img.dtype != np.uint8:
            return f"image dtype must be uint8, got {img.dtype}"
        s = self.image_size
        if img.shape != (s, s, 3):
            return f"image shape must be ({s}, {s}, 3), got {tuple(img.shape)}"
        return ""

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._process(batch)

    def _process(self, batch):
        n = len(batch)
        images = np.stack([b[0] for b in batch] + [batch[-1][0]] * (self.batch_size - n))
        try:
            # Everything that can raise happens BEFORE any claim/delivery, so
            # a failure anywhere reaches the error path with zero requests
            # claimed — each waiter gets exactly one reply and is counted
            # exactly once (a mid-loop failure after partial delivery would
            # otherwise double-count and double-put on size-1 reply queues).
            out = self.decode(self.params, self.state, images)
            ids = np.asarray(out.ids)
            beta_attr = getattr(out, "beta", None)
            # None (no sentinel gate in this decoder's output) -> empty beta
            # lists; a zeros fallback would fabricate a [0.0] gate per caption
            betas = np.asarray(beta_attr) if beta_attr is not None else None
            replies = []
            for i in range(n):
                caption = self.vocab.decode_ids(ids[i])
                n_words = len(caption.split())
                replies.append(
                    {
                        "caption": caption,
                        "beta": [float(b) for b in betas[i][:n_words]]
                        if betas is not None and betas.ndim == 2 else [],
                    }
                )
        except Exception as e:  # surface errors to every live waiter
            with self._lock:
                live = [b for b in batch if not b[3]["abandoned"]]
                for b in live:
                    b[3]["claimed"] = True
                self._counters["errors"] += len(live)
            for _, _, reply, _ in live:
                reply.put({"error": f"{type(e).__name__}: {e}"})
            return
        done = time.monotonic()
        with self._lock:  # claim delivery atomically vs caller timeouts
            live = [b for b in batch if not b[3]["abandoned"]]
            for b in live:
                b[3]["claimed"] = True
            self._counters["batches"] += 1
            self._counters["completed"] += len(live)
            self._fill_hist[n] += 1
            for _, t0, _, _ in live:
                ms = (done - t0) * 1e3
                self._lat_hist[bisect.bisect_left(_LAT_EDGES_MS, ms)] += 1
        self._ready.set()
        for (_, _, reply, flags), r in zip(batch, replies):
            if flags["claimed"]:  # not claimed: timed out; counted in submit
                reply.put(r)
