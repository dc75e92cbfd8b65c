"""main_train with the mesh auto-engaged (batch divisible by the 8-device
virtual grid): exercises sharded device_prefetch + SPMD steps in the real loop."""

import os

import jax
import numpy as np
import pytest

from adaptive_tpu.data.coco_api import COCO
from adaptive_tpu.data.synthetic import make_synthetic_dataset
from adaptive_tpu.data.vocab import build_vocab
from adaptive_tpu.training import main_train

pytestmark = pytest.mark.slow  # heavyweight e2e; quick pass skips via -m 'not slow'


def test_main_train_with_mesh(tmp_path, tiny_cf, capsys):
    assert len(jax.devices()) == 8
    ann, resized = make_synthetic_dataset(str(tmp_path), num_images=16, image_size=72, seed=5)
    coco = COCO(ann)
    vocab = build_vocab((a["caption"] for a in coco.anns.values()), threshold=1)
    vocab_path = os.path.join(str(tmp_path), "vocab.json")
    vocab.save(vocab_path)
    cf = tiny_cf.replace(
        vocab_path=vocab_path, vocab_length=len(vocab), resized_image_dir=resized,
        train_anno_path=ann, val_anno_path=ann, train_eval_anno_path=ann,
        exp_dir=str(tmp_path / "exp"), train_num_epochs=1, train_batch_size=8,
        train_evalOrnot=False, dataloader_num_workers=2, train_log_step=1000,
        train_tb_interval_batches=10000, mesh_shape=(-1, 1),
    )
    os.makedirs(cf.exp_dir, exist_ok=True)
    params, state, _, _ = main_train(cf)
    out = capsys.readouterr().out
    assert "mesh disabled" not in out  # 8 % 8 == 0 -> mesh engaged
    assert np.isfinite(np.asarray(params["decoder"]["embed"])).all()
