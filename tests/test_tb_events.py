"""MetricWriter must emit real TensorBoard event files (VERDICT r1 #8):
`tensorboard --logdir` plots the run. Verified by loading the logdir with
TensorBoard's own EventAccumulator. Reference: tensorboardX usage at
code_src/train.py:47-49,128-138,144,164."""

import numpy as np
import pytest

pytest.importorskip("tensorboardX")
pytest.importorskip("tensorboard")

from adaptive_tpu.utils.logging import MetricWriter


def test_event_files_load_in_tensorboard(tmp_path):
    logdir = str(tmp_path)
    w = MetricWriter(logdir)
    for step, loss in enumerate([3.0, 2.5, 2.0]):
        w.add_scalar("loss-performance/train loss per epoch", loss, step)
    w.add_scalars("loss-performance/Cider per epoch", {"train": 0.5, "valid": 0.4}, 1)
    w.add_scalar("learning_rate_per_epoch/decoder", 1e-3, 1)
    w.add_histogram("Weights_decoder/embed", np.random.default_rng(0).normal(size=512), 1)
    w.close()

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(logdir)
    acc.Reload()
    tags = acc.Tags()
    # tensorboardX sanitizes spaces to underscores (the reference's event
    # files had the same sanitized tags)
    assert "loss-performance/train_loss_per_epoch" in tags["scalars"]
    assert "loss-performance/Cider_per_epoch/train" in tags["scalars"]
    assert "learning_rate_per_epoch/decoder" in tags["scalars"]
    assert "Weights_decoder/embed" in tags["histograms"]

    pts = acc.Scalars("loss-performance/train_loss_per_epoch")
    assert [p.step for p in pts] == [0, 1, 2]
    assert [round(p.value, 4) for p in pts] == [3.0, 2.5, 2.0]

    # JSONL fallback still written alongside
    assert (tmp_path / "scalars.jsonl").exists()
    assert (tmp_path / "histograms.jsonl").exists()
