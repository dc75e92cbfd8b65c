"""Mid-epoch (step-interval) checkpoint/resume — train_checkpoint_every_steps.

Beyond-reference capability: the reference checkpoints once per epoch and
restores weights only (train.py:176-178, model_factory.py:15-19). Here a
'_step-K' checkpoint carries the full resume payload (params, BN, optimizer
moments, rng stream position, epoch-loss accumulator, metric histories), and
a preempted run restarted from it must be BIT-IDENTICAL to the uninterrupted
run — asserted below on the final params.
"""

import json
import os
import time

import numpy as np
import pytest

from adaptive_tpu.training import checkpoint as ckpt


# --------------------------------------------------------------- unit level


def test_resume_point_ordering_and_find_latest(tmp_path):
    """Epoch-complete and step checkpoints interleave chronologically:
    model-1 < model-2_step-3 < model-2_step-7 < model-2 < model-3_step-1."""
    names = [
        "cider-0.5000_model-1",
        "cider-0.0000_model-2_step-3",
        "cider-0.0000_model-2_step-7",
        "cider-0.6000_model-2",
        "cider-0.0000_model-3_step-1",
    ]
    points = [ckpt._resume_point(n) for n in names]
    assert points == [(2, 0), (2, 3), (2, 7), (3, 0), (3, 1)]
    assert sorted(points) == points

    for n in names[:3] + ["junk", "x.tmp"]:
        os.makedirs(tmp_path / n, exist_ok=True)
    assert ckpt.find_latest_checkpoint(str(tmp_path)).endswith("model-2_step-7")
    os.makedirs(tmp_path / names[3])
    assert ckpt.find_latest_checkpoint(str(tmp_path)).endswith("cider-0.6000_model-2")
    os.makedirs(tmp_path / names[4])
    assert ckpt.find_latest_checkpoint(str(tmp_path)).endswith("model-3_step-1")
    # step checkpoints never surface as "best" (no measured CIDEr)
    assert ckpt.find_best_checkpoint(str(tmp_path)).endswith("cider-0.6000_model-2")


def test_stale_step_checkpoints_selection(tmp_path):
    for n in ["cider-0.0000_model-2_step-3", "cider-0.0000_model-2_step-7",
              "cider-0.0000_model-3_step-1", "cider-0.5000_model-2"]:
        os.makedirs(tmp_path / n)
    stale = {os.path.basename(p)
             for p in ckpt.stale_step_checkpoints(str(tmp_path), 3, 1)}
    # strictly-before (3, 1): both epoch-2 steps; never epoch-completes
    assert stale == {"cider-0.0000_model-2_step-3", "cider-0.0000_model-2_step-7"}
    assert ckpt.stale_step_checkpoints(str(tmp_path), 2, 3) == []


def test_prune_only_removes_step_dirs(tmp_path):
    """_write_checkpoint_files prunes only stale '_step-' dirs, listed AFTER
    the new checkpoint landed (no call-site race with in-flight writes)."""
    keep = tmp_path / "cider-0.5000_model-1"
    stale = tmp_path / "cider-0.0000_model-1_step-2"
    os.makedirs(keep)
    os.makedirs(stale)
    ckpt._write_checkpoint_files(
        str(tmp_path / "cider-0.0000_model-1_step-4"),
        {"x": np.zeros(1, np.float32)}, None, {},
        prune_before=(1, 4),
    )
    assert not stale.exists()
    assert keep.exists()  # epoch-complete dirs are never pruned
    new = tmp_path / "cider-0.0000_model-1_step-4"
    assert (new / "model.npz").exists()  # the new resume point itself survives


# ---------------------------------------------------------------- e2e level


def _setup_cf(tmp_path, tiny_cf, tag: str):
    from adaptive_tpu.data.coco_api import COCO
    from adaptive_tpu.data.synthetic import make_synthetic_dataset
    from adaptive_tpu.data.vocab import build_vocab

    ann, resized = make_synthetic_dataset(
        str(tmp_path / "data"), num_images=16, image_size=72, seed=3
    )
    coco = COCO(ann)
    vocab = build_vocab((a["caption"] for a in coco.anns.values()), threshold=1)
    vocab_path = str(tmp_path / "vocab.json")
    vocab.save(vocab_path)
    exp = str(tmp_path / ("exp_" + tag))
    os.makedirs(exp, exist_ok=True)
    return tiny_cf.replace(
        vocab_path=vocab_path, vocab_length=len(vocab), resized_image_dir=resized,
        train_anno_path=ann, val_anno_path=ann, train_eval_anno_path=ann,
        exp_dir=exp, train_num_epochs=2, train_batch_size=2,
        train_evalOrnot=False, dataloader_num_workers=2, train_log_step=100,
        train_tb_interval_batches=10000, train_checkpoint_every_steps=3,
        train_auto_resume_dir=os.path.join(exp, "trained_models"),
    )


def _wait_for_step_ckpt(directory: str, timeout: float = 30.0) -> str:
    """The AsyncCheckpointer thread outlives the preempted main_train call;
    wait for its in-flight '_step-' write to land (atomic rename)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        hits = [n for n in os.listdir(directory)
                if "_step-" in n and not n.endswith(".tmp")]
        if hits:
            return os.path.join(directory, sorted(hits)[-1])
        time.sleep(0.2)
    raise AssertionError("no step checkpoint appeared in %s" % directory)


@pytest.mark.slow
def test_mid_epoch_resume_bit_identical(tmp_path, tiny_cf, monkeypatch):
    from adaptive_tpu.training import main_train
    from adaptive_tpu.training import train_loop as tl
    import jax

    # ---- run A: uninterrupted (the ground truth)
    cfA = _setup_cf(tmp_path, tiny_cf, "a")
    paramsA, stateA, _, _ = main_train(cfA)

    # after the final epoch checkpoint, every '_step-' dir must be pruned
    leftover = [n for n in os.listdir(cfA.train_auto_resume_dir) if "_step-" in n]
    assert leftover == [], leftover

    # ---- run B: preempted after 4 steps (a step-3 checkpoint exists), then
    # auto-resumed with the SAME config — the standard preemptible contract
    cfB = _setup_cf(tmp_path, tiny_cf, "b")
    calls = {"n": 0}
    orig_make = tl.make_train_step

    def make_limited(model, dual, cf):
        step = orig_make(model, dual, cf)

        def limited(*a, **k):
            if calls["n"] >= 4:
                raise RuntimeError("synthetic preemption")
            calls["n"] += 1
            return step(*a, **k)

        return limited

    monkeypatch.setattr(tl, "make_train_step", make_limited)
    with pytest.raises(RuntimeError, match="synthetic preemption"):
        main_train(cfB)
    monkeypatch.setattr(tl, "make_train_step", orig_make)

    latest = _wait_for_step_ckpt(cfB.train_auto_resume_dir)
    meta = json.load(open(os.path.join(latest, "manifest.json")))
    assert meta["step_in_epoch"] == 3 and meta["epoch"] == 1
    assert "rng_key" in meta and meta["epoch_n_steps"] == 3

    paramsB, stateB, _, _ = main_train(cfB)  # auto-resumes from step 3

    # bit-identical to the uninterrupted run: same batch plan (epoch-pinned
    # shuffle), same rng stream (restored), f32-exact state round-trip
    for pa, pb in zip(jax.tree.leaves(paramsA), jax.tree.leaves(paramsB)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for sa, sb in zip(jax.tree.leaves(stateA), jax.tree.leaves(stateB)):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))

    # the resumed run's epoch checkpoints subsumed and pruned the step dirs
    leftover = [n for n in os.listdir(cfB.train_auto_resume_dir) if "_step-" in n]
    assert leftover == [], leftover
