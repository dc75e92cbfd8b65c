"""bench.py helper units: checkpoint vocab detection must not count the
embed table's pad rows as vocabulary, and image-dir loading must skip
directories whose names look like image files."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _write_ckpt(tmp_path, rows, manifest=None):
    d = tmp_path / "ckpt"
    d.mkdir()
    np.savez(d / "model.npz", **{"params|decoder|embed": np.zeros((rows, 4), np.float32)})
    if manifest is not None:
        (d / "manifest.json").write_text(json.dumps(manifest))
    return str(d)


def test_checkpoint_vocab_uses_manifest(tmp_path):
    """configs ship vocab_pad_multiple=128 (10123 -> 10240 embed rows); the
    117 pad rows keep random init and MUST stay masked in the bench model —
    manifest.json's vocab_length (train_loop resume_meta) is authoritative."""
    path = _write_ckpt(tmp_path, 10240, {"vocab_length": 10123, "epoch": 3})
    v, m = bench._checkpoint_vocab(path)
    assert v == 10123 and m == 10240
    # the derived pad multiple reproduces the checkpoint's padded table
    assert ((v + m - 1) // m) * m == 10240


def test_checkpoint_vocab_unpadded(tmp_path):
    path = _write_ckpt(tmp_path, 57, {"vocab_length": 57})
    assert bench._checkpoint_vocab(path) == (57, 1)


def test_checkpoint_vocab_fallback_without_manifest(tmp_path, capsys):
    path = _write_ckpt(tmp_path, 64, manifest=None)
    assert bench._checkpoint_vocab(path) == (64, 1)
    assert "WARNING" in capsys.readouterr().out


def test_load_images_dir_skips_dirs_named_like_images(tmp_path):
    from PIL import Image

    (tmp_path / "thumbs.jpg").mkdir()  # directory with an image-y name
    Image.new("RGB", (8, 8), (10, 20, 30)).save(tmp_path / "a.jpg")
    out = bench._load_images_dir(str(tmp_path), batch=4, size=16)
    assert out.shape == (4, 16, 16, 3) and out.dtype == np.uint8


def test_load_images_dir_empty_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        bench._load_images_dir(str(tmp_path), batch=2)


def test_serving_bench_percentile_json_safe():
    """Zero completed requests at a level must serialize as JSON null, not a
    bare NaN (invalid JSON for the tool's line consumers)."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "serving_bench", os.path.join(root, "tools", "serving_bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.percentile([], 50) is None
    json.loads(json.dumps({"p50_ms": m.percentile([], 50)}))  # round-trips
    assert m.percentile([3.0, 1.0, 2.0], 50) == 2.0
