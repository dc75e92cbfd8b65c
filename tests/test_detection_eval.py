"""Detection-eval parity: our clean-room COCOeval vs. the reference's
vendored cocoeval.py executed as an oracle (with our COCO + native mask lib
injected — the reference's own Cython _mask.so is py35-only)."""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

from adaptive_tpu.data.coco_api import COCO
from adaptive_tpu.evalcap.detection import COCOeval

REF_COCOEVAL = "/root/reference/coco/PythonAPI/pycocotools/cocoeval.py"


@pytest.fixture(scope="module")
def ref_cocoeval():
    # numpy>=1.24 removed np.float; the reference uses it (cocoeval.py:379),
    # and its Params uses float nums in np.linspace — shim both for the oracle.
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    # the shim must stay active: reference Params() is built lazily at
    # COCOeval() construction time inside the tests
    orig_linspace = np.linspace
    np.linspace = lambda a, b, num, **kw: orig_linspace(a, b, int(num), **kw)

    pkg = types.ModuleType("refpkg")
    pkg.__path__ = []
    sys.modules["refpkg"] = pkg
    from adaptive_tpu.native import mask as mymask

    sys.modules["refpkg.mask"] = mymask
    spec = importlib.util.spec_from_file_location("refpkg.cocoeval", REF_COCOEVAL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refpkg.cocoeval"] = mod
    spec.loader.exec_module(mod)
    yield mod
    np.linspace = orig_linspace


def _synthetic_det_dataset(tmp_path, seed=0, n_imgs=4, n_cats=2):
    rng = np.random.default_rng(seed)
    images = [{"id": i + 1, "height": 120, "width": 160} for i in range(n_imgs)]
    categories = [{"id": c + 1, "name": f"cat{c+1}", "supercategory": "x"} for c in range(n_cats)]
    gts, dts = [], []
    aid = 1
    for img in images:
        for c in range(n_cats):
            for _ in range(rng.integers(1, 4)):
                x, y = float(rng.integers(0, 100)), float(rng.integers(0, 70))
                w, h = float(rng.integers(10, 60)), float(rng.integers(10, 50))
                gts.append({
                    "id": aid, "image_id": img["id"], "category_id": c + 1,
                    "bbox": [x, y, w, h], "area": w * h,
                    "iscrowd": int(rng.random() < 0.15),
                    "segmentation": [[x, y, x, y + h, x + w, y + h, x + w, y]],
                })
                aid += 1
                # detections: jittered copies + spurious boxes
                for _ in range(rng.integers(1, 3)):
                    dx, dy = rng.normal(0, 6, 2)
                    dts.append({
                        "image_id": img["id"], "category_id": c + 1,
                        "bbox": [x + dx, y + dy, w * rng.uniform(0.8, 1.2), h * rng.uniform(0.8, 1.2)],
                        "score": float(rng.random()),
                    })
        dts.append({
            "image_id": img["id"], "category_id": int(rng.integers(1, n_cats + 1)),
            "bbox": [5.0, 5.0, 20.0, 20.0], "score": float(rng.random()),
        })
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps({"images": images, "categories": categories, "annotations": gts}))
    return str(gt_path), dts


@pytest.mark.parametrize("ioutype", ["bbox", "segm"])
def test_detection_ap_matches_reference(tmp_path, ref_cocoeval, ioutype):
    gt_path, dts = _synthetic_det_dataset(tmp_path)
    if ioutype == "segm":
        for d in dts:
            x, y, w, h = d["bbox"]
            d["segmentation"] = [[x, y, x, y + h, x + w, y + h, x + w, y]]
    cocoGt = COCO(gt_path)
    cocoDt = cocoGt.loadRes([dict(d) for d in dts])

    ours = COCOeval(cocoGt, cocoGt.loadRes([dict(d) for d in dts]), ioutype)
    ours.evaluate()
    ours.accumulate()
    got = ours.summarize()

    ref = ref_cocoeval.COCOeval(cocoGt, cocoDt, ioutype)
    ref.evaluate()
    ref.accumulate()
    ref.summarize()
    want = ref.stats

    np.testing.assert_allclose(got, want, atol=1e-10)


def test_keypoints_ap_matches_reference(tmp_path, ref_cocoeval):
    rng = np.random.default_rng(1)
    images = [{"id": 1, "height": 200, "width": 200}, {"id": 2, "height": 200, "width": 200}]
    categories = [{"id": 1, "name": "person", "supercategory": "person"}]
    gts, dts = [], []
    aid = 1
    for img in images:
        for _ in range(2):
            base = rng.uniform(40, 140, 2)
            kps = []
            for _ in range(17):
                kps.extend([float(base[0] + rng.normal(0, 15)), float(base[1] + rng.normal(0, 15)), 2])
            gts.append({
                "id": aid, "image_id": img["id"], "category_id": 1,
                "keypoints": kps, "num_keypoints": 17,
                "bbox": [float(base[0] - 30), float(base[1] - 30), 60.0, 60.0],
                "area": 3600.0, "iscrowd": 0,
            })
            aid += 1
            dkps = list(kps)
            for i in range(0, len(dkps), 3):
                dkps[i] += float(rng.normal(0, 5))
                dkps[i + 1] += float(rng.normal(0, 5))
            dts.append({"image_id": img["id"], "category_id": 1, "keypoints": dkps,
                        "score": float(rng.random())})
    gt_path = tmp_path / "gt_kp.json"
    gt_path.write_text(json.dumps({"images": images, "categories": categories, "annotations": gts}))

    cocoGt = COCO(str(gt_path))
    ours = COCOeval(cocoGt, cocoGt.loadRes([dict(d) for d in dts]), "keypoints")
    ours.evaluate()
    ours.accumulate()
    got = ours.summarize()

    ref = ref_cocoeval.COCOeval(cocoGt, cocoGt.loadRes([dict(d) for d in dts]), "keypoints")
    ref.evaluate()
    ref.accumulate()
    ref.summarize()
    np.testing.assert_allclose(got, ref.stats, atol=1e-10)


def test_fake_bbox_results_fixture_loads(tmp_path):
    """The reference's checked-in fake bbox results file must load through our
    COCO.loadRes + evaluate without error (gt annotations are a missing blob,
    so synthesize a matching gt skeleton from the results)."""
    path = "/root/reference/coco/results/instances_val2014_fakebbox100_results.json"
    with open(path) as f:
        dts = json.load(f)
    img_ids = sorted({d["image_id"] for d in dts})
    cat_ids = sorted({d["category_id"] for d in dts})
    rng = np.random.default_rng(0)
    gts = []
    for i, d in enumerate(dts[::2]):  # half the detections as "gt"
        x, y, w, h = d["bbox"]
        gts.append({"id": i + 1, "image_id": d["image_id"], "category_id": d["category_id"],
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps({
        "images": [{"id": i, "height": 640, "width": 640} for i in img_ids],
        "categories": [{"id": c, "name": str(c)} for c in cat_ids],
        "annotations": gts,
    }))
    cocoGt = COCO(str(gt_path))
    cocoDt = cocoGt.loadRes(path)
    ev = COCOeval(cocoGt, cocoDt, "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats.shape == (12,)
    assert stats[0] > 0.3  # half the dts are exact gt copies -> decent AP


@pytest.mark.parametrize("seed,n_imgs,n_cats", [(7, 6, 3), (11, 2, 1), (13, 8, 4)])
def test_detection_ap_fuzz_matches_reference(tmp_path, ref_cocoeval, seed, n_imgs, n_cats):
    """Randomized dataset shapes/sizes through both evaluators: catches
    binning/edge drift the single curated dataset misses."""
    gt_path, dts = _synthetic_det_dataset(tmp_path, seed=seed, n_imgs=n_imgs, n_cats=n_cats)
    cocoGt = COCO(gt_path)

    ours = COCOeval(cocoGt, cocoGt.loadRes([dict(d) for d in dts]), "bbox")
    ours.evaluate()
    ours.accumulate()
    got = ours.summarize()

    ref = ref_cocoeval.COCOeval(cocoGt, cocoGt.loadRes([dict(d) for d in dts]), "bbox")
    ref.evaluate()
    ref.accumulate()
    ref.summarize()
    np.testing.assert_allclose(got, ref.stats, atol=1e-10)
