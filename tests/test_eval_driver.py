"""coco_eval driver edges: beam mode, duplicate image dedup, annToRLE forms."""

import json
import os

import numpy as np
import pytest

from adaptive_tpu.data.coco_api import COCO


def test_coco_eval_beam_mode(tmp_path, tiny_cf):
    from adaptive_tpu.data.synthetic import make_synthetic_dataset
    from adaptive_tpu.data.vocab import build_vocab
    from adaptive_tpu.evalcap.coco_eval import coco_eval
    from adaptive_tpu.models.factory import build_model
    import jax

    ann, resized = make_synthetic_dataset(str(tmp_path), num_images=5, image_size=72, seed=4)
    coco = COCO(ann)
    vocab = build_vocab((a["caption"] for a in coco.anns.values()), threshold=1)
    cf = tiny_cf.replace(
        vocab_length=len(vocab), resized_image_dir=resized, val_anno_path=ann,
        eval_batch_size=4, beam_size=3, decode_max_len=6, exp_dir=str(tmp_path),
        dataloader_num_workers=2,
    )
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    per_image = {}
    cider = coco_eval(cf, model, params, state, epoch=1, vocab=vocab,
                      per_image_out=per_image)
    assert np.isfinite(cider)
    with open(os.path.join(str(tmp_path), "val_results", "validation-1.json")) as f:
        results = json.load(f)
    assert len(results) == 5  # one caption per image, last batch padded+deduped
    # per-image scores back the gate's paired statistics (tools/int8_gate.py):
    # one entry per image, each with a CIDEr whose mean is the corpus score
    assert len(per_image) == 5
    np.testing.assert_allclose(
        np.mean([v["CIDEr"] for v in per_image.values()]), cider, rtol=1e-9
    )


def test_results_name_no_collision():
    """Checkpoint paths embedding the CIDEr score must not collide
    (the reference's first-dot truncation maps them all to 'cider-0.json',
    utils.py:205-222 — intentional deviation, see _results_name)."""
    from adaptive_tpu.evalcap.coco_eval import _results_name

    a = _results_name("exp/cider-0.9300_model-9.pkl")
    b = _results_name("exp/cider-0.8100_model-3.pkl")
    assert a != b
    assert a == "exp_cider-0_9300_model-9.json"
    # directory-style checkpoints (orbax-style dirs, no extension)
    assert _results_name("exp/cider-0.9300_model-9/") == "exp_cider-0_9300_model-9.json"
    assert _results_name("m.msgpack") == "m.json"


def test_valid_mode_requires_checkpoint(tiny_cf):
    """valid/test mode with no checkpoint path must fail loudly, not score
    random weights (reference crashes in load_state_dict, utils.py:262-266)."""
    from adaptive_tpu.evalcap.coco_eval import get_testOrValid_model

    cf = tiny_cf.replace(valid_pretrained_model="", vocab_length=25)
    with pytest.raises(ValueError, match="valid_pretrained_model"):
        get_testOrValid_model(cf, test_mode=False, valid_mode=True)


def test_ann_to_rle_uncompressed_counts(tmp_path):
    """COCO 'uncompressed RLE' (counts as list) -> compact RLE."""
    from adaptive_tpu.native import mask as M

    m = np.zeros((10, 8), np.uint8)
    m[2:5, 1:4] = 1
    rle = M.encode(m)
    # decode the compact counts into a plain list for the uncompressed form
    flat = m.ravel(order="F")
    counts, run, val = [], 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, px
    counts.append(run)

    data = {
        "images": [{"id": 1, "height": 10, "width": 8}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "segmentation": {"size": [10, 8], "counts": counts},
                         "area": 9, "bbox": [1, 2, 3, 3], "iscrowd": 0}],
        "categories": [{"id": 1, "name": "x"}],
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(data))
    coco = COCO(str(p))
    out = coco.annToMask(coco.anns[1])
    np.testing.assert_array_equal(out, m)


def test_ann_to_rle_polygon(tmp_path):
    data = {
        "images": [{"id": 1, "height": 20, "width": 20}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "segmentation": [[4.0, 4.0, 4.0, 12.0, 12.0, 12.0, 12.0, 4.0]],
                         "area": 64, "bbox": [4, 4, 8, 8], "iscrowd": 0}],
        "categories": [{"id": 1, "name": "x"}],
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(data))
    coco = COCO(str(p))
    mask = coco.annToMask(coco.anns[1])
    assert 36 <= mask.sum() <= 100  # ~8x8 square
