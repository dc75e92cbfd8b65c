"""CaptionService micro-batching tests (CPU, tiny model)."""

import threading

import numpy as np
import pytest

from adaptive_tpu.data.vocab import SPECIALS, Vocabulary
from adaptive_tpu.serving import CaptionService


@pytest.fixture(scope="module")
def service(tiny_cf):
    vocab = Vocabulary(SPECIALS + [f"w{i}" for i in range(28)])
    cf = tiny_cf.replace(vocab_length=len(vocab), eval_batch_size=4, decode_max_len=5)
    svc = CaptionService(cf, vocab, batch_size=4, max_wait_ms=30)
    yield svc
    svc.close()


def test_single_request(service, tiny_cf):
    img = np.random.default_rng(0).integers(0, 255, (72, 72, 3), dtype=np.uint8)
    out = service.caption(img, timeout=120)
    assert "caption" in out and isinstance(out["caption"], str)
    assert "error" not in out


def test_concurrent_requests_batch_together(service):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (72, 72, 3), dtype=np.uint8) for _ in range(6)]
    results = [None] * 6

    def ask(i):
        results[i] = service.caption(imgs[i], timeout=120)

    threads = [threading.Thread(target=ask, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and "caption" in r for r in results)


def test_deterministic_per_image(service):
    img = np.random.default_rng(2).integers(0, 255, (72, 72, 3), dtype=np.uint8)
    a = service.caption(img, timeout=120)
    b = service.caption(img, timeout=120)
    assert a["caption"] == b["caption"]


def test_invalid_inputs_rejected_not_raised(service):
    bad_shape = np.zeros((10, 10, 3), np.uint8)
    bad_dtype = np.zeros((72, 72, 3), np.float32)
    assert "shape" in service.caption(bad_shape)["error"]
    assert "dtype" in service.caption(bad_dtype)["error"]
    assert "numpy" in service.caption([[1, 2]])["error"]
    # the worker must survive invalid inputs
    assert service.healthy()


def test_health_ready_and_stats(service):
    img = np.random.default_rng(3).integers(0, 255, (72, 72, 3), dtype=np.uint8)
    service.caption(img, timeout=120)
    assert service.healthy() and service.ready()
    st = service.stats()
    assert st["completed"] >= 1 and st["batches"] >= 1
    assert sum(st["latency_ms_hist"].values()) == st["completed"]
    assert sum(st["batch_fill_hist"].values()) == st["batches"]
    # steady-state serving preps the weights exactly once; a miss per batch
    # would mean the identity-keyed prepare cache is being defeated
    assert st["prepare_cache_misses"] == 1
    assert st["prepare_cache_hits"] == st["batches"] - 1
    # stats must be JSON-serializable (feeds /statz)
    import json

    json.dumps(st)


def test_http_front_end(service):
    """examples/serve.py endpoints: healthz/readyz/statz, caption round trip,
    413 oversize, 400 non-image."""
    import http.client
    import io
    import json
    import os
    import sys
    import threading

    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from serve import build_server

    server = build_server(service, port=0, max_body_mb=0.5)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]

        def req(method, path, body=None):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            c.request(method, path, body=body)
            r = c.getresponse()
            data = r.read()
            c.close()
            return r.status, data

        assert req("GET", "/healthz")[0] == 200
        service.warmup()  # force one decode so readiness holds in any test order
        assert req("GET", "/readyz")[0] == 200
        status, data = req("GET", "/statz")
        assert status == 200 and b"batch_fill_hist" in data

        buf = io.BytesIO()
        Image.fromarray(np.zeros((72, 72, 3), np.uint8)).save(buf, "PNG")
        status, data = req("POST", "/caption", buf.getvalue())
        assert status == 200 and b"caption" in data

        assert req("POST", "/caption", b"x" * (600 * 1024))[0] == 413
        assert req("POST", "/caption", b"not an image")[0] == 400
        assert req("GET", "/nope")[0] == 404
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_int8_serving_requires_and_uses_calibration(tiny_cf):
    """encoder_quant='int8' without calibration images fails loudly; with
    them, the service decodes through the static-PTQ encoder."""
    from adaptive_tpu.data.vocab import SPECIALS, Vocabulary
    from adaptive_tpu.serving import CaptionService

    vocab = Vocabulary(SPECIALS + [f"w{i}" for i in range(28)])
    cf = tiny_cf.replace(
        vocab_length=len(vocab), eval_batch_size=2, decode_max_len=4,
        encoder_quant="int8",
    )
    with pytest.raises(ValueError, match="calibration_images"):
        CaptionService(cf, vocab, batch_size=2)

    rng = np.random.default_rng(9)
    calib = rng.integers(0, 255, (4, 72, 72, 3), dtype=np.uint8)
    svc = CaptionService(cf, vocab, batch_size=2, calibration_images=calib)
    try:
        out = svc.caption(calib[0], timeout=180)
        assert "caption" in out
        assert svc.model.int8_scales  # scales actually baked in
    finally:
        svc.close()


def test_timeout_counted_once_and_worker_survives(tiny_cf):
    """A request whose caller gives up counts under 'timeouts' only; the
    worker skips the reader-less reply, later requests still succeed, and
    the counter identity requests == completed+errors+shed+invalid+timeouts
    holds."""
    import time

    from adaptive_tpu.data.vocab import SPECIALS, Vocabulary
    from adaptive_tpu.serving import CaptionService

    vocab = Vocabulary(SPECIALS + [f"w{i}" for i in range(28)])
    cf = tiny_cf.replace(vocab_length=len(vocab), eval_batch_size=2, decode_max_len=4)
    svc = CaptionService(cf, vocab, batch_size=2, max_wait_ms=5)
    try:
        img = np.zeros((72, 72, 3), np.uint8)
        # the first decode compiles (seconds on CPU) — a 1 ms deadline loses
        out = svc.caption(img, timeout=0.001)
        assert out["error"] == "timeout"
        deadline = time.monotonic() + 180
        while svc.stats()["batches"] < 1:  # worker finishes the abandoned one
            assert time.monotonic() < deadline, "worker never processed batch"
            time.sleep(0.05)
        st = svc.stats()
        assert st["timeouts"] == 1 and st["completed"] == 0
        assert "caption" in svc.caption(img, timeout=180)  # worker survived
        st = svc.stats()
        assert st["requests"] == (
            st["completed"] + st["errors"] + st["shed"] + st["invalid"] + st["timeouts"]
        )
        assert st["completed"] == 1 and st["timeouts"] == 1
    finally:
        svc.close()


def test_mid_delivery_failure_counts_each_request_once(tiny_cf):
    """A failure AFTER decode succeeds (e.g. caption conversion) must reach
    every waiter as one error dict — never a second reply to an
    already-served caller, never double-counting a request as both completed
    and error (the reply payloads are built before delivery is claimed)."""
    from adaptive_tpu.data.vocab import SPECIALS, Vocabulary
    from adaptive_tpu.serving import CaptionService

    vocab = Vocabulary(SPECIALS + [f"w{i}" for i in range(28)])
    cf = tiny_cf.replace(vocab_length=len(vocab), eval_batch_size=2, decode_max_len=4)
    # a 2 s window guarantees both requests join one batch of 2
    svc = CaptionService(cf, vocab, batch_size=2, max_wait_ms=2000)
    calls = {"n": 0}
    real = svc.vocab.decode_ids

    def flaky(ids):
        calls["n"] += 1
        if calls["n"] == 2:  # second row of the first batch
            raise RuntimeError("boom")
        return real(ids)

    svc.vocab = type("V", (), {"decode_ids": staticmethod(flaky)})()
    try:
        img = np.zeros((72, 72, 3), np.uint8)
        results = [None, None]

        def ask(i):
            results[i] = svc.caption(img, timeout=180)

        threads = [threading.Thread(target=ask, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert all(r is not None for r in results)
        # both callers see the error; nobody hangs, nobody gets two replies
        assert all("boom" in r.get("error", "") for r in results), results
        st = svc.stats()
        assert st["errors"] == 2 and st["completed"] == 0
        assert st["requests"] == (
            st["completed"] + st["errors"] + st["shed"] + st["invalid"] + st["timeouts"]
        )
        svc.vocab = vocab  # worker survived; normal service resumes
        assert "caption" in svc.caption(img, timeout=180)
    finally:
        svc.close()


def test_overload_shedding(tiny_cf):
    """A full queue sheds with an 'overloaded' error instead of blocking."""
    from adaptive_tpu.data.vocab import SPECIALS, Vocabulary
    from adaptive_tpu.serving import CaptionService

    vocab = Vocabulary(SPECIALS + [f"w{i}" for i in range(28)])
    cf = tiny_cf.replace(vocab_length=len(vocab), eval_batch_size=2, decode_max_len=4)
    svc = CaptionService(cf, vocab, batch_size=2, max_wait_ms=1, max_queue=1)
    try:
        svc._stop.set()  # freeze the worker so the queue can't drain
        svc._worker.join(timeout=10)
        img = np.zeros((72, 72, 3), np.uint8)
        svc._stop.clear()  # allow enqueue; worker stays dead
        first = svc._queue.put_nowait(
            (img, 0.0, None, {"abandoned": False, "claimed": False})
        )  # fill the queue
        out = svc.caption(img, timeout=5)
        assert out["error"] == "overloaded"
        assert svc.stats()["shed"] == 1
    finally:
        svc._stop.set()


def test_two_phase_service_matches_default(tiny_cf):
    """scan_prefix + early_exit at the service level: same caption as the
    default fixed-loop service for the same image (ids are bit-identical at
    the decoder level, tests/test_decoding.py; this pins the plumbing)."""
    vocab = Vocabulary(SPECIALS + [f"w{i}" for i in range(28)])
    cf = tiny_cf.replace(vocab_length=len(vocab), eval_batch_size=2,
                         decode_max_len=5)
    img = np.random.default_rng(3).integers(0, 255, (72, 72, 3), dtype=np.uint8)
    fixed = CaptionService(cf, vocab, batch_size=2, max_wait_ms=1)
    try:
        want = fixed.caption(img, timeout=120)["caption"]
    finally:
        fixed.close()
    two = CaptionService(cf, vocab, batch_size=2, max_wait_ms=1,
                         early_exit=True, scan_prefix=3)
    try:
        assert two.cf.decode_early_exit and two.cf.decode_scan_prefix == 3
        assert two.caption(img, timeout=120)["caption"] == want
    finally:
        two.close()
