"""Legacy pycocotools v1.0.1 compat layer vs the reference file as oracle."""

import json
import sys
import types

import numpy as np
import pytest

from adaptive_tpu.data.coco_legacy import COCO as LegacyCOCO


@pytest.fixture(scope="module")
def ref_coco_cls():
    """Import the reference's v1.0.1 COCO class with viz deps stubbed
    (matplotlib/skimage are only needed by showAnns/segToMask)."""
    import importlib.util

    stubs = {}
    for name in ["matplotlib", "matplotlib.pyplot", "matplotlib.collections",
                 "matplotlib.patches", "skimage", "skimage.draw"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "matplotlib.collections":
                mod.PatchCollection = object
            if name == "matplotlib.patches":
                mod.Polygon = object
            if name == "skimage.draw":
                mod.polygon = lambda *a: (np.zeros(0, int), np.zeros(0, int))
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_legacy_coco", "/root/reference/coco/pycocotools/coco.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.COCO
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


def _captions_doc():
    return {
        "info": {"year": 2014, "description": "tiny"},
        "type": "captions",
        "licenses": [{"id": 1}],
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 10, "image_id": 1, "caption": "a cat"},
            {"id": 11, "image_id": 1, "caption": "a dog"},
            {"id": 12, "image_id": 2, "caption": "a bird"},
        ],
    }


def _instances_doc():
    return {
        "info": {"year": 2014},
        "type": "instances",
        "licenses": [],
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "area": 10.0, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 2, "area": 99.0, "iscrowd": 1},
        ],
        "categories": [
            {"id": 1, "name": "cat", "supercategory": "animal"},
            {"id": 2, "name": "car", "supercategory": "vehicle"},
        ],
    }


def test_index_and_getters_match_reference(tmp_path, ref_coco_cls):
    for doc in (_captions_doc(), _instances_doc()):
        p = tmp_path / "d.json"
        p.write_text(json.dumps(doc))
        ours, ref = LegacyCOCO(str(p)), ref_coco_cls(str(p))
        assert sorted(ours.getImgIds()) == sorted(ref.getImgIds())
        assert ours.getAnnIds() == ref.getAnnIds()
        assert ours.getAnnIds(imgIds=1) == ref.getAnnIds(imgIds=1)
        assert ours.loadImgs(1) == ref.loadImgs(1)
        if doc["type"] == "instances":
            assert ours.getCatIds(supNms=["animal"]) == ref.getCatIds(supNms=["animal"])
            assert ours.getAnnIds(iscrowd=1) == ref.getAnnIds(iscrowd=1)
            assert ours.getAnnIds(areaRng=[5, 50]) == ref.getAnnIds(areaRng=[5, 50])
            assert sorted(ours.getImgIds(catIds=[2])) == sorted(ref.getImgIds(catIds=[2]))


def test_mask_codec_matches_reference(ref_coco_cls):
    rng = np.random.default_rng(0)
    for shape in [(7, 5), (1, 9), (12, 12)]:
        m = (rng.random(shape) < 0.4).astype(np.uint8)
        r_ours = LegacyCOCO.encodeMask(m)
        r_ref = ref_coco_cls.encodeMask(m)
        assert r_ours == {"size": list(r_ref["size"]), "counts": list(r_ref["counts"])}
        np.testing.assert_array_equal(
            LegacyCOCO.decodeMask(r_ours), ref_coco_cls.decodeMask(json.loads(json.dumps(r_ref)))
        )
    # leading-zero quirk: mask starting with 1
    m = np.ones((3, 3), np.uint8)
    assert LegacyCOCO.encodeMask(m)["counts"][0] == 0


def test_load_res_ids_from_zero(tmp_path, ref_coco_cls):
    doc = _captions_doc()
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(doc))
    res_anns = [
        {"image_id": 1, "caption": "hello"},
        {"image_id": 2, "caption": "world"},
    ]
    rp = tmp_path / "res.json"
    rp.write_text(json.dumps(res_anns))
    ours = LegacyCOCO(str(p)).loadRes(str(rp))
    ref = ref_coco_cls(str(p)).loadRes(str(rp))
    assert sorted(ours.anns.keys()) == sorted(ref.anns.keys()) == [0, 1]  # v1: from 0
    assert ours.anns[0]["caption"] == ref.anns[0]["caption"]


def test_seg_to_mask_square():
    m = LegacyCOCO.segToMask([[2.0, 2.0, 2.0, 8.0, 8.0, 8.0, 8.0, 2.0]], 10, 10)
    assert m.dtype == bool and 30 <= m.sum() <= 60  # ~6x6 square
    assert m[4, 4] and not m[0, 0]


def test_info_works():
    """The reference's info() always crashes on a typo (coco.py:113 'datset');
    ours is fixed — documented intentional deviation."""
    c = LegacyCOCO()
    c.dataset = {"info": {"year": 2014}}
    c.info()  # must not raise
