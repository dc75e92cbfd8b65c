from adaptive_tpu.data.tokenizer import caption_tokenize
from adaptive_tpu.data.vocab import (END, END_ID, PAD, PAD_ID, START, START_ID,
                                     UNK, UNK_ID, Vocabulary, build_vocab)


def test_tokenizer_drops_punctuation_and_lowercases():
    toks = caption_tokenize("A man, riding a HORSE!")
    assert toks == ["a", "man", "riding", "a", "horse"]


def test_tokenizer_contractions():
    # Treebank behavior: "it's" -> ["it", "'s"]; "'s" is not in string.punctuation
    toks = caption_tokenize("it's a dog's day")
    assert toks == ["it", "'s", "a", "dog", "'s", "day"]


def test_special_token_ids():
    v = Vocabulary([PAD, START, END, UNK])
    assert v(PAD) == PAD_ID == 0
    assert v(START) == START_ID == 1
    assert v(END) == END_ID == 2
    assert v(UNK) == UNK_ID == 3
    assert v("never-seen") == UNK_ID


def test_build_vocab_threshold():
    caps = ["a dog runs", "a dog sits", "a cat sits"]
    v = build_vocab(caps, threshold=2)
    # counts: a=3, dog=2, sits=2; runs/cat = 1 -> dropped
    assert "dog" in v and "sits" in v and "a" in v
    assert "runs" not in v and "cat" not in v
    assert len(v) == 4 + 3  # specials + kept words


def test_encode_decode_roundtrip():
    v = build_vocab(["a dog runs fast", "a dog runs fast"], threshold=1)
    ids = v.encode_caption("a dog runs fast")
    assert ids[0] == START_ID and ids[-1] == END_ID
    assert v.decode_ids(ids[1:]) == "a dog runs fast"


def test_decode_stops_at_end():
    v = build_vocab(["a dog", "a dog"], threshold=1)
    ids = v.encode_caption("a dog") + [v("a"), v("dog")]
    assert v.decode_ids(ids[1:]) == "a dog"


def test_save_load_roundtrip(tmp_path):
    v = build_vocab(["a dog runs", "a dog runs"], threshold=1)
    path = str(tmp_path / "vocab.json")
    v.save(path)
    v2 = Vocabulary.load(path)
    assert v2.word2idx == v.word2idx
    assert len(v2) == len(v)
