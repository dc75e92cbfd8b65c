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
