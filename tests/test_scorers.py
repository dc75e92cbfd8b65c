"""Scorer parity vs. the reference's vendored pure-Python scorers (run as
oracles directly from /root/reference — not copied)."""

import random
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from adaptive_tpu.evalcap.bleu import Bleu
from adaptive_tpu.evalcap.cider import Cider
from adaptive_tpu.evalcap.meteor import Meteor, sentence_meteor
from adaptive_tpu.evalcap.ptbtokenizer import PTBTokenizer, tokenize_caption
from adaptive_tpu.evalcap.rouge import Rouge, lcs_length

ref_bleu = pytest.importorskip("coco.pycocoevalcap.bleu.bleu")
ref_cider = pytest.importorskip("coco.pycocoevalcap.cider.cider")
ref_rouge = pytest.importorskip("coco.pycocoevalcap.rouge.rouge")

WORDS = "a the dog cat man woman rides sits runs beach park red blue small big on in with near".split()


def _corpus(n_imgs, seed, max_len=12):
    rng = random.Random(seed)
    gts, res = {}, {}
    for i in range(n_imgs):
        gts[i] = [
            " ".join(rng.choices(WORDS, k=rng.randint(3, max_len))) for _ in range(rng.randint(1, 5))
        ]
        res[i] = [" ".join(rng.choices(WORDS, k=rng.randint(1, max_len)))]
    return gts, res


@pytest.mark.parametrize("n_imgs,seed", [(1, 0), (2, 1), (25, 2), (100, 3)])
def test_bleu_matches_reference(n_imgs, seed):
    gts, res = _corpus(n_imgs, seed)
    ours, ours_per = Bleu(4).compute_score(gts, res)
    theirs, theirs_per = ref_bleu.Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


@pytest.mark.parametrize("n_imgs,seed", [(2, 1), (25, 2), (100, 3)])
def test_cider_matches_reference(n_imgs, seed):
    gts, res = _corpus(n_imgs, seed)
    ours, ours_per = Cider().compute_score(gts, res)
    theirs, theirs_per = ref_cider.Cider().compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-10)


@pytest.mark.parametrize("n_imgs,seed", [(1, 0), (25, 2), (100, 3)])
def test_rouge_matches_reference(n_imgs, seed):
    gts, res = _corpus(n_imgs, seed)
    ours, ours_per = Rouge().compute_score(gts, res)
    theirs, theirs_per = ref_rouge.Rouge().compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


def test_lcs():
    assert lcs_length("a b c d".split(), "a c d".split()) == 3
    assert lcs_length([], "a".split()) == 0


def test_bleu_perfect_match():
    gts = {0: ["a dog runs fast", "the dog is running"]}
    res = {0: ["a dog runs fast"]}
    scores, _ = Bleu(4).compute_score(gts, res)
    assert all(s > 0.99 for s in scores)


def test_meteor_properties():
    # identical sentences score higher than disjoint ones; bounded [0,1]
    s_same = sentence_meteor("a dog runs on the beach", "a dog runs on the beach")
    s_partial = sentence_meteor("a dog runs on the beach", "a cat runs in the park")
    s_none = sentence_meteor("x y z", "a b c")
    assert 0.99 <= s_same <= 1.0
    assert 0 < s_partial < s_same
    assert s_none == 0.0


def test_meteor_stem_matching():
    # 'running' should partially match 'runs' via Porter stems ('run')
    with_stem = sentence_meteor("the dog running", "the dog runs")
    assert with_stem > sentence_meteor("the dog xyzzy", "the dog runs")


def test_meteor_fragmentation_penalty():
    # same matches, scrambled order -> more chunks -> lower score
    inorder = sentence_meteor("a b c d", "a b c d")
    scrambled = sentence_meteor("d c b a", "a b c d")
    assert scrambled < inorder


def test_meteor_corpus_api():
    gts = {1: ["a dog runs"], 2: ["the cat sits"]}
    res = {1: ["a dog runs"], 2: ["a bird flies"]}
    mean, scores = Meteor().compute_score(gts, res)
    assert len(scores) == 2 and scores[0] > scores[1]
    assert abs(mean - sum(scores) / 2) < 1e-12


def test_ptb_tokenizer_drops_punct_and_lowercases():
    out = tokenize_caption("A man, riding; a (horse)!")
    assert out == "a man riding a horse"


def test_ptb_tokenizer_dict_protocol():
    caps = {7: [{"caption": "A Dog."}, {"caption": "Big dog!"}]}
    out = PTBTokenizer().tokenize(caps)
    assert out == {7: ["a dog", "big dog"]}
