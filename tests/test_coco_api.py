import json

import pytest

from adaptive_tpu.data.coco_api import COCO


@pytest.fixture()
def tiny_coco(tmp_path):
    data = {
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 10, "image_id": 1, "caption": "a dog"},
            {"id": 11, "image_id": 1, "caption": "a big dog"},
            {"id": 12, "image_id": 2, "caption": "a cat"},
        ],
    }
    p = tmp_path / "anno.json"
    p.write_text(json.dumps(data))
    return COCO(str(p))


def test_index(tiny_coco):
    assert set(tiny_coco.getImgIds()) == {1, 2}
    assert set(tiny_coco.getAnnIds(imgIds=1)) == {10, 11}
    assert tiny_coco.loadImgs(2)[0]["file_name"] == "b.jpg"
    assert tiny_coco.loadAnns(12)[0]["caption"] == "a cat"


def test_load_res(tiny_coco, tmp_path):
    res = [{"image_id": 1, "caption": "a dog runs"}, {"image_id": 2, "caption": "a cat sits"}]
    p = tmp_path / "res.json"
    p.write_text(json.dumps(res))
    cocoRes = tiny_coco.loadRes(str(p))
    assert set(cocoRes.getImgIds()) == {1, 2}
    assert len(cocoRes.imgToAnns[1]) == 1
    assert cocoRes.imgToAnns[2][0]["caption"] == "a cat sits"


def test_load_res_rejects_unknown_image(tiny_coco):
    with pytest.raises(AssertionError):
        tiny_coco.loadRes([{"image_id": 999, "caption": "x"}])
