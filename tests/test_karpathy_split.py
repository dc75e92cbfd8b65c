"""Karpathy split parity: identical outputs to the reference's split code
(run from /root/reference as an oracle — it is torch-free)."""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from adaptive_tpu.data.karpathy_split import main_KarpathySplit


def _fake_coco_origin(tmp_path, n_train=60, n_val=40, seed=7):
    rng = np.random.default_rng(seed)

    def make(n, offset):
        images = [{"id": offset + i, "file_name": f"img{offset+i}.jpg"} for i in range(n)]
        anns = []
        for i in range(n):
            for j in range(2):
                anns.append({"id": (offset + i) * 10 + j, "image_id": offset + i,
                             "caption": f"cap {offset+i} {j}"})
        return {"images": images, "annotations": anns, "info": {"v": 1}, "licenses": ["L"]}

    train, val = make(n_train, 1000), make(n_val, 5000)
    tp, vp = str(tmp_path / "tr.json"), str(tmp_path / "va.json")
    json.dump(train, open(tp, "w"))
    json.dump(val, open(vp, "w"))
    return tp, vp


def _cf(tmp_path, prefix, tp, vp):
    cf = types.SimpleNamespace()
    cf.train_random_seed = 123
    cf.num_val = 10
    cf.num_test = 10
    cf.num_train_eval = 15
    cf.num_train_overfit = 5
    cf.num_train_hyperparameter = 20
    cf.num_train_eval_hyperparameter = 8
    cf.num_val_hyperparameter = 4
    cf.captions_train_origin = tp
    cf.captions_val_origin = vp
    cf.splited_anno_path_prefix = str(tmp_path / prefix)
    return cf


SUBSETS = ["val", "test", "train", "train_eval", "val_hyperparameter",
           "train_hyperparameter", "train_eval_hyperparameter", "train_overfit"]


def test_split_matches_reference(tmp_path):
    ref_split = pytest.importorskip("code_src.data.KarpathySplit")
    tp, vp = _fake_coco_origin(tmp_path)

    ref_split.main_KarpathySplit(_cf(tmp_path, "ref_", tp, vp))
    main_KarpathySplit(_cf(tmp_path, "ours_", tp, vp))

    for subset in SUBSETS:
        with open(tmp_path / f"ref_{subset}.json") as f:
            want = json.load(f)
        with open(tmp_path / f"ours_{subset}.json") as f:
            got = json.load(f)
        assert got == want, f"subset {subset} differs"


def test_split_sizes(tmp_path):
    tp, vp = _fake_coco_origin(tmp_path)
    cf = _cf(tmp_path, "s_", tp, vp)
    out = main_KarpathySplit(cf)
    assert len(out["val"]["images"]) == 10
    assert len(out["test"]["images"]) == 10
    assert len(out["train"]["images"]) == 80  # 100 - 10 - 10
    assert len(out["train_overfit"]["images"]) == 5
    # overfit split keeps exactly 1 annotation per image (KarpathySplit.py:64-67)
    assert len(out["train_overfit"]["annotations"]) == 5
    assert len(out["train"]["annotations"]) == 160
