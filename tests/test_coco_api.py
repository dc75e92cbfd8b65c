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


def test_info_prints_dataset_info(tmp_path, capsys):
    data = {
        "info": {"description": "tiny", "version": "1.0"},
        "images": [],
        "annotations": [],
    }
    p = tmp_path / "anno.json"
    p.write_text(json.dumps(data))
    COCO(str(p)).info()
    out = capsys.readouterr().out
    assert "description: tiny" in out and "version: 1.0" in out


def test_show_anns_captions_print(tiny_coco, capsys):
    assert tiny_coco.showAnns([]) == 0
    tiny_coco.showAnns(tiny_coco.loadAnns([10, 12]))
    out = capsys.readouterr().out
    assert "a dog" in out and "a cat" in out


def test_show_anns_polygons(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 8, "width": 8}],
        "annotations": [
            {
                "id": 1,
                "image_id": 1,
                "category_id": 1,
                "segmentation": [[1, 1, 1, 5, 5, 5, 5, 1]],
                "area": 16,
                "iscrowd": 0,
            }
        ],
        "categories": [{"id": 1, "name": "thing"}],
    }
    p = tmp_path / "anno.json"
    p.write_text(json.dumps(data))
    coco = COCO(str(p))
    fig = plt.figure()
    try:
        coco.showAnns(coco.loadAnns(coco.getAnnIds(imgIds=1)))
        # two PatchCollections: translucent fill + outline
        assert len(plt.gca().collections) == 2
    finally:
        plt.close(fig)


def test_load_numpy_annotations(tiny_coco):
    import numpy as np

    rows = np.array(
        [
            [1, 10.0, 20.0, 30.0, 40.0, 0.9, 3],
            [2, 0.0, 0.0, 5.0, 5.0, 0.5, 7],
        ]
    )
    anns = tiny_coco.loadNumpyAnnotations(rows)
    assert anns[0]["image_id"] == 1 and anns[0]["category_id"] == 3
    assert anns[0]["bbox"] == [10.0, 20.0, 30.0, 40.0]
    assert anns[1]["score"] == 0.5
    with pytest.raises(AssertionError):
        tiny_coco.loadNumpyAnnotations(np.zeros((2, 6)))


def test_download_requires_target_dir(tiny_coco):
    assert tiny_coco.download() == -1


def test_download_skips_existing_files(tmp_path, tiny_coco):
    # files already on disk are never re-fetched, so no network is touched
    (tmp_path / "a.jpg").write_bytes(b"x")
    (tmp_path / "b.jpg").write_bytes(b"y")
    tiny_coco.download(str(tmp_path))
    assert (tmp_path / "a.jpg").read_bytes() == b"x"


def test_id_arguments_accept_any_iterable(tmp_path, tiny_coco):
    # ndarrays and generators are Iterable[int] too, not single opaque ids
    import numpy as np

    assert tiny_coco.loadImgs(np.array([1, 2]))[1]["file_name"] == "b.jpg"
    assert set(tiny_coco.getAnnIds(imgIds=iter([1]))) == {10, 11}
    (tmp_path / "a.jpg").write_bytes(b"x")
    tiny_coco.download(str(tmp_path), imgIds=iter([1]))
    assert (tmp_path / "a.jpg").read_bytes() == b"x"
