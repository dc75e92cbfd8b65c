"""End-to-end pipeline on the synthetic 20-image overfit fixture: vocab build
-> train a few epochs -> loss drops -> decode -> CIDEr through our scorer
stack. Mirrors the reference's overfit sanity check (KarpathySplit.py:38,
statics:6) as an automated integration test."""

import json
import os

import numpy as np
import pytest

from adaptive_tpu.config import Config
from adaptive_tpu.data.coco_api import COCO
from adaptive_tpu.data.loader import CocoCaptionDataset, EvalBatches, EvalImageDataset, TrainBatches
from adaptive_tpu.data.synthetic import make_synthetic_dataset
from adaptive_tpu.data.vocab import Vocabulary, build_vocab


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    ann_path, resized_dir = make_synthetic_dataset(root, num_images=8, image_size=72, seed=0)
    coco = COCO(ann_path)
    vocab = build_vocab((a["caption"] for a in coco.anns.values()), threshold=1)
    vocab_path = os.path.join(root, "vocab.json")
    vocab.save(vocab_path)
    cf = Config(
        atten_model_name="adaptive_attention",
        encoder_backbone="resnet18",
        train_crop_size=64,
        resized_image_size=72,
        vocab_path=vocab_path,
        vocab_length=len(vocab),
        train_anno_path=ann_path,
        val_anno_path=ann_path,
        train_eval_anno_path=ann_path,
        resized_image_dir=resized_dir,
        adaptive_word_embed_size=16,
        adaptive_lstm_hidden_size=32,
        train_batch_size=4,
        eval_batch_size=4,
        decode_max_len=10,
        train_num_epochs=3,
        train_evalOrnot=False,
        dataloader_num_workers=2,
        train_log_step=1000,
        train_tb_interval_batches=10_000,
        experiment_path=root,
        exp_dir=os.path.join(root, "exp"),
    )
    os.makedirs(cf.exp_dir, exist_ok=True)
    return cf, vocab, ann_path


def test_loader_shapes(synth):
    cf, vocab, ann_path = synth
    ds = CocoCaptionDataset(cf.resized_image_dir, cf.train_anno_path, vocab)
    batches = list(TrainBatches(ds, 4, num_workers=2))
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 72, 72, 3) and b["images"].dtype == np.uint8
    assert b["captions"].shape[0] == 4 and b["captions"].shape[1] in (16, 24, 32, 56)
    assert (b["lengths"] >= 2).all()
    # captions start with <start>=1 and have <end>=2 at position length-1
    for r in range(4):
        assert b["captions"][r, 0] == 1
        assert b["captions"][r, b["lengths"][r] - 1] == 2
        assert (b["captions"][r, b["lengths"][r]:] == 0).all()


def test_eval_loader_pads_last_batch(synth):
    cf, vocab, ann_path = synth
    ds = EvalImageDataset(cf.resized_image_dir, cf.train_anno_path)
    batches = list(EvalBatches(ds, 3, num_workers=2))
    assert len(batches) == 3
    last = batches[-1]
    assert last["images"].shape[0] == 3
    assert last["valid"].sum() == 2  # 8 images, batches of 3 -> 3,3,2


@pytest.fixture(scope="module")
def trained(synth):
    """One shared overfit training run for the e2e and int8-gate tests."""
    cf, vocab, ann_path = synth
    from adaptive_tpu.training import main_train

    params, state, _, _ = main_train(cf)
    return params, state


@pytest.mark.slow
def test_overfit_loss_decreases_and_e2e_eval(synth, trained):
    cf, vocab, ann_path = synth
    params, state = trained

    # loss must drop substantially over 3 epochs on 8 fixed samples
    scalars = [
        json.loads(l)
        for l in open(os.path.join(cf.exp_dir, "tensorboard", "scalars.jsonl"))
    ]
    epoch_losses = [s["value"] for s in scalars if s["tag"] == "loss-performance/train loss per epoch"]
    assert len(epoch_losses) == 3
    assert epoch_losses[-1] < epoch_losses[0] * 0.8, epoch_losses

    # checkpoints exist with the reference naming contract
    ckpts = os.listdir(os.path.join(cf.exp_dir, "trained_models"))
    assert any("model-3" in c for c in ckpts)

    # end-to-end eval: decode + score through the caption-metric stack
    from adaptive_tpu.evalcap.coco_eval import coco_eval
    from adaptive_tpu.models.factory import build_model

    model = build_model(cf)
    cider = coco_eval(cf, model, params, state, epoch=3, vocab=vocab)
    assert np.isfinite(cider) and cider >= 0.0
    # results file written
    assert os.path.exists(os.path.join(cf.exp_dir, "val_results", "validation-3.json"))


def test_int8_quality_gate(synth, trained):
    """Quality gate for the int8 serving mode (VERDICT r1 #3): on a trained
    model, decoding with the int8-calibrated encoder must move CIDEr by less
    than 0.01 vs the default compute dtype. bench.py's default int8 config is
    promoted on the strength of this gate."""
    import jax.numpy as jnp

    from adaptive_tpu.data.loader import EvalBatches, EvalImageDataset
    from adaptive_tpu.evalcap.coco_eval import coco_eval
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.models.infer import calibrate_int8
    from adaptive_tpu.ops.preprocess import eval_preprocess

    cf, vocab, ann_path = synth
    params, state = trained

    base_model = build_model(cf)
    cider_base = coco_eval(cf, base_model, params, state, epoch=101, vocab=vocab)

    # calibrate activation scales on the eval images themselves
    ds = EvalImageDataset(cf.resized_image_dir, cf.val_anno_path)
    batch = next(iter(EvalBatches(ds, 8, num_workers=1)))
    calib = eval_preprocess(
        jnp.asarray(batch["images"]), cf.train_crop_size, jnp.float32
    )
    cf8 = cf.replace(encoder_quant="int8")
    model8 = build_model(cf8)
    model8 = model8._replace(
        int8_scales=calibrate_int8(params["encoder"], state, calib, cf.encoder_backbone)
    )
    cider_int8 = coco_eval(cf8, model8, params, state, epoch=102, vocab=vocab)

    assert abs(cider_int8 - cider_base) < 0.01, (cider_base, cider_int8)
