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
