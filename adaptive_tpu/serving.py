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
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


class CaptionService:
    """Thread-safe micro-batching captioner.

    caption(image_u8 [S,S,3]) -> (caption str, beta list) — blocks until the
    batched decode completes.
    """

    def __init__(self, cf, vocab, params=None, state=None, checkpoint: str = "",
                 batch_size: Optional[int] = None, max_wait_ms: float = 5.0):
        import jax

        from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder
        from adaptive_tpu.models.factory import build_model

        self.vocab = vocab
        self.cf = cf.replace(vocab_length=len(vocab))
        self.batch_size = batch_size or cf.eval_batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.model = build_model(self.cf)
        if params is None:
            params, state = jax.jit(self.model.init)(jax.random.PRNGKey(cf.train_random_seed))
            if checkpoint:
                from adaptive_tpu.training import checkpoint as ckpt

                params, state = ckpt.restore_model(checkpoint, params, state)
        self.params, self.state = params, state
        self.decode = (
            make_beam_decoder(self.model, self.cf)
            if self.cf.beam_size > 1
            else make_greedy_decoder(self.model, self.cf)
        )
        self._queue: "queue.Queue[Tuple[np.ndarray, queue.Queue]]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ api
    def caption(self, image_u8: np.ndarray, timeout: Optional[float] = 60.0) -> Dict:
        assert image_u8.ndim == 3 and image_u8.dtype == np.uint8
        if self._stop.is_set():
            return {"error": "service closed"}
        reply: "queue.Queue" = queue.Queue(1)
        self._queue.put((image_u8, reply))
        return reply.get(timeout=timeout)

    def warmup(self):
        img = np.zeros((self.cf.resized_image_size,) * 2 + (3,), np.uint8)
        self.caption(img, timeout=None)  # first call compiles

    def close(self):
        """Stop the worker and fail any queued/in-flight requests."""
        self._stop.set()
        self._worker.join(timeout=10)
        while True:  # drain: callers must not block forever
            try:
                _, reply = self._queue.get_nowait()
            except queue.Empty:
                break
            reply.put({"error": "service closed"})

    # ------------------------------------------------------------- internals
    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait
            while len(batch) < self.batch_size:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._process(batch)

    def _process(self, batch: List[Tuple[np.ndarray, queue.Queue]]):
        n = len(batch)
        images = np.stack([b[0] for b in batch] + [batch[-1][0]] * (self.batch_size - n))
        try:
            out = self.decode(self.params, self.state, images)
            ids = np.asarray(out.ids)
            betas = np.asarray(getattr(out, "beta", np.zeros((self.batch_size, 1))))
            for i, (_, reply) in enumerate(batch):
                caption = self.vocab.decode_ids(ids[i])
                n_words = len(caption.split())
                reply.put(
                    {
                        "caption": caption,
                        "beta": [float(b) for b in betas[i][:n_words]] if betas.ndim == 2 else [],
                    }
                )
        except Exception as e:  # surface errors to every waiter
            for _, reply in batch:
                reply.put({"error": f"{type(e).__name__}: {e}"})
