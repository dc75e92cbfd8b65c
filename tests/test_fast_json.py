"""Native columnar JSON extractor: differential vs stdlib json.

Covers the gason-capability component (coco/common/gason.{h,cpp}) rebuilt as
adaptive_tpu/native/jsonlib.cpp + data/fast_json.py.
"""

import json

import numpy as np
import pytest

from adaptive_tpu.data.fast_json import load_captions, load_columns


def _write(tmp_path, doc, name="ann.json"):
    p = tmp_path / name
    p.write_text(json.dumps(doc), encoding="utf-8")
    return str(p)


def _basic_doc():
    return {
        "info": {"year": 2014, "nested": {"a": [1, 2, {"b": None}], "ok": True}},
        "images": [
            {"id": 7, "file_name": "a.jpg", "height": 480, "width": 640, "license": 1},
            {"id": 9, "file_name": "dir/b.png"},
        ],
        "annotations": [
            {"id": 1, "image_id": 7, "caption": "a man riding a horse ."},
            {"id": 2, "image_id": 9, "caption": 'quotes " backslash \\ slash / tab\t.'},
            {"id": 3, "image_id": 9, "caption": "unicode café ☃ \U0001F600"},
        ],
        "categories": [{"id": 4, "name": "animal", "supercategory": "x"}],
        "licenses": [{"id": 1, "url": "http://x"}],
    }


def test_columns_match_stdlib(tmp_path):
    path = _write(tmp_path, _basic_doc())
    cols = load_columns(path)
    assert cols is not None
    ref = json.load(open(path))
    np.testing.assert_array_equal(cols.img_ids, [i["id"] for i in ref["images"]])
    np.testing.assert_array_equal(cols.img_heights, [480, -1])
    np.testing.assert_array_equal(cols.img_widths, [640, -1])
    assert cols.file_names == [i["file_name"] for i in ref["images"]]
    np.testing.assert_array_equal(cols.ann_ids, [a["id"] for a in ref["annotations"]])
    np.testing.assert_array_equal(cols.ann_img_ids, [a["image_id"] for a in ref["annotations"]])
    assert cols.captions == [a["caption"] for a in ref["annotations"]]
    assert cols.cat_ids.tolist() == [4] and cols.cat_names == ["animal"]


def test_escape_fidelity(tmp_path):
    """All JSON escapes incl. surrogate pairs decode exactly like stdlib."""
    tricky = [
        "\" \\ / \b \f \n \r \t",
        "café ☃",
        "\U0001F600\U0001F680",  # surrogate pairs in the file
        "mixed Aß東\U0001F600 end",
        "",
    ]
    doc = {
        "images": [],
        "annotations": [
            {"id": i, "image_id": i, "caption": c} for i, c in enumerate(tricky)
        ],
    }
    path = _write(tmp_path, doc)
    assert load_captions(path) == [a["caption"] for a in json.load(open(path))["annotations"]]


def test_number_forms_and_unknown_keys(tmp_path):
    """Float ids (results-file style), exponents, deep unknown structure."""
    raw = (
        '{"junk": [1e3, -2.5E-2, [[[{"x": null}]]], false], '
        '"annotations": [{"id": 1.0, "image_id": 4.2e1, "caption": "hi", '
        '"extra": {"deep": [1, {"q": "\\u0041"}]}}], "images": []}'
    )
    p = tmp_path / "r.json"
    p.write_text(raw)
    cols = load_columns(str(p))
    assert cols.ann_ids.tolist() == [1] and cols.ann_img_ids.tolist() == [42]
    assert cols.captions == ["hi"]


def test_detection_annotations_have_empty_captions(tmp_path):
    doc = {
        "images": [{"id": 1, "file_name": "x.jpg", "height": 4, "width": 4}],
        "annotations": [{"id": 5, "image_id": 1, "category_id": 2,
                         "bbox": [0, 0, 2, 2], "area": 4.0, "iscrowd": 0}],
        "categories": [{"id": 2, "name": "cat"}],
    }
    cols = load_columns(_write(tmp_path, doc))
    assert cols.captions == [""] and cols.ann_ids.tolist() == [5]


def test_malformed_returns_none(tmp_path):
    for bad in ['{"annotations": [{]}', '[1,2,3]', '{"a": 1} trailing',
                "{} trailing", "{", ""]:
        p = tmp_path / "bad.json"
        p.write_text(bad)
        assert load_columns(str(p)) is None
    assert load_columns(str(tmp_path / "missing.json")) is None


def test_deep_nesting_falls_back_not_crashes(tmp_path):
    """Pathological nesting must surface as a parse failure (None -> stdlib
    fallback), not a C-stack segfault of the whole process."""
    deep = "[" * 200_000 + "]" * 200_000
    p = tmp_path / "deep.json"
    p.write_text('{"junk": ' + deep + ', "annotations": [], "images": []}')
    assert load_columns(str(p)) is None
    # moderate nesting (well under the guard) still parses fine
    ok = tmp_path / "ok.json"
    ok.write_text('{"junk": ' + "[" * 100 + "]" * 100 + ', "annotations": [], "images": []}')
    assert load_columns(str(ok)) is not None


def test_non_coco_json_returns_none(tmp_path):
    """Valid JSON without images/annotations keys is not a COCO file: the
    caller must fall back to stdlib json (whose KeyError is the loud error),
    not receive silently empty columns."""
    for doc in ['{"foo": 1}', "{}", '{"categories": []}']:
        p = tmp_path / "x.json"
        p.write_text(doc)
        assert load_columns(str(p)) is None
    # image-info-only files ARE COCO files (0 annotations is real data)
    p = tmp_path / "info.json"
    p.write_text('{"images": [{"id": 1, "file_name": "a.jpg"}]}')
    cols = load_columns(str(p))
    assert cols is not None and len(cols.ann_ids) == 0


def test_vocab_stage_uses_fast_path(tmp_path):
    """main_build_vocab produces an identical vocabulary through the native
    scanner and the stdlib COCO path (same insertion order)."""
    from adaptive_tpu.config import load_config
    from adaptive_tpu.data import fast_json
    from adaptive_tpu.data.vocab import main_build_vocab

    doc = {
        "images": [{"id": i, "file_name": f"{i}.jpg"} for i in range(3)],
        "annotations": [
            {"id": 1, "image_id": 0, "caption": "a dog runs fast"},
            {"id": 2, "image_id": 1, "caption": "a cat sits on a dog"},
            {"id": 3, "image_id": 2, "caption": "the dog and the cat nap"},
        ],
    }
    ann = _write(tmp_path, doc)
    cf = load_config(None, train_anno_path=ann, vocab_threshold=2,
                     vocab_path=str(tmp_path / "v1.json"))
    v_native = main_build_vocab(cf)
    # force the stdlib fallback
    orig = fast_json.load_captions
    fast_json.load_captions = lambda p: None
    try:
        cf2 = cf.replace(vocab_path=str(tmp_path / "v2.json"))
        v_std = main_build_vocab(cf2)
    finally:
        fast_json.load_captions = orig
    assert [v_native.idx2word[i] for i in range(len(v_native))] == [
        v_std.idx2word[i] for i in range(len(v_std))
    ]


def test_large_file_speed_and_parity(tmp_path):
    """~8 MB synthetic captions file: identical captions, and the columnar
    scan should not be slower than stdlib json.load + dict walk."""
    import time

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(500)]
    anns = [
        {"id": i, "image_id": i // 5,
         "caption": " ".join(rng.choice(words, 10)), "extra": [1.5] * 8}
        for i in range(40_000)
    ]
    doc = {"images": [{"id": i, "file_name": f"{i:012d}.jpg"} for i in range(8000)],
           "annotations": anns}
    path = _write(tmp_path, doc)

    t0 = time.perf_counter()
    caps_native = load_captions(path)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    ref = json.load(open(path))
    caps_std = [a["caption"] for a in ref["annotations"]]
    t_std = time.perf_counter() - t0

    assert caps_native == caps_std
    print(f"native {t_native * 1e3:.0f} ms vs stdlib {t_std * 1e3:.0f} ms")
    assert t_native < t_std * 1.5  # generous: CI boxes are noisy
