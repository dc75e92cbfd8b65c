"""Data pipeline stages: reference vocab.pkl ingestion + resize stage."""

import os

import numpy as np
import pytest

from adaptive_tpu.data.vocab import Vocabulary

REF_VOCAB = "/root/reference/code_src/data/vocab.pkl"


@pytest.mark.skipif(not os.path.exists(REF_VOCAB), reason="reference vocab unavailable")
def test_reads_reference_vocab_pickle():
    """The reference's checked-in vocab.pkl (10,123 words, statics:1) loads
    through the legacy unpickler with identical ids."""
    v = Vocabulary.load(REF_VOCAB)
    assert len(v) == 10123
    assert [v.idx2word[i] for i in range(4)] == ["<pad>", "<start>", "<end>", "<unk>"]
    assert v("definitely-not-a-word") == 3


def test_resize_stage(tmp_path):
    from PIL import Image

    from adaptive_tpu.data.resize import main_resize_images
    from adaptive_tpu.config import Config

    src = tmp_path / "raw" / "train2014"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (100 + i * 7, 80, 3), dtype=np.uint8)).save(
            src / f"img{i}.jpg"
        )
    cf = Config(image_dir=str(tmp_path / "raw"), resized_image_dir=str(tmp_path / "resized"),
                resized_image_size=64)
    main_resize_images(cf)
    out = tmp_path / "resized" / "train2014"
    files = sorted(os.listdir(out))
    assert len(files) == 3
    for f in files:
        with Image.open(out / f) as im:
            assert im.size == (64, 64)


def test_download_script_smoke(tmp_path):
    """download.sh parse/unzip/layout logic against a local fixture server
    (VERDICT r3 #9): tiny zips served over a localhost http.server stand in
    for the cocodataset.org endpoints via the COCO_*_URL overrides — the
    real wget -c + unzip -o + cleanup path runs end to end, no network.
    Reference: code_src/data/download.sh:1-11."""
    import json
    import shutil
    import socket
    import subprocess
    import threading
    import zipfile
    from functools import partial
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    if not (shutil.which("wget") and shutil.which("unzip")):
        pytest.skip("wget/unzip not installed")

    # fixture zips with the real archives' internal layout
    srv_root = tmp_path / "srv"
    (srv_root / "zips").mkdir(parents=True)
    (srv_root / "annotations").mkdir()

    def make_zip(path, members):
        with zipfile.ZipFile(path, "w") as z:
            for name, payload in members.items():
                z.writestr(name, payload)

    anno = json.dumps({"images": [], "annotations": [], "type": "captions"})
    make_zip(srv_root / "annotations" / "annotations_trainval2014.zip",
             {"annotations/captions_train2014.json": anno,
              "annotations/captions_val2014.json": anno})
    make_zip(srv_root / "zips" / "train2014.zip",
             {"train2014/COCO_train2014_000000000001.jpg": b"\xff\xd8fakejpeg"})
    make_zip(srv_root / "zips" / "val2014.zip",
             {"val2014/COCO_val2014_000000000002.jpg": b"\xff\xd8fakejpeg"})

    handler = partial(SimpleHTTPRequestHandler, directory=str(srv_root))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        script = os.path.join(os.path.dirname(__file__), "..",
                              "adaptive_tpu", "data", "download.sh")
        target = tmp_path / "MSCOCO"
        env = dict(os.environ,
                   COCO_IMAGES_URL=f"http://127.0.0.1:{port}/zips",
                   COCO_ANNOTATIONS_URL=f"http://127.0.0.1:{port}/annotations")
        proc = subprocess.run(["bash", script, str(target)], env=env,
                              capture_output=True, text=True, timeout=60)
        assert proc.returncode == 0, proc.stderr
    finally:
        httpd.shutdown()
        httpd.server_close()

    # the reference layout: annotations/annotations/*.json + image dirs
    assert (target / "annotations" / "annotations" / "captions_train2014.json").exists()
    assert (target / "annotations" / "annotations" / "captions_val2014.json").exists()
    assert (target / "train2014" / "COCO_train2014_000000000001.jpg").exists()
    assert (target / "val2014" / "COCO_val2014_000000000002.jpg").exists()
    # archives cleaned up after extraction
    assert not list(target.glob("*.zip"))
    # the downloaded annotation json is readable
    with open(target / "annotations" / "annotations" / "captions_val2014.json") as f:
        assert json.load(f)["type"] == "captions"
