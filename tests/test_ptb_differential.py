"""Differential corpus test for the clean-room PTB tokenizer (VERDICT r1 #6).

The reference tokenizes scoring text with Stanford CoreNLP 3.4.1
`edu.stanford.nlp.process.PTBTokenizer -preserveLines -lowerCase` then drops
a fixed punctuation list (coco/pycocoevalcap/tokenizer/ptbtokenizer.py:24-69).
The jar is a missing blob, so the oracle here is hand-curated expected output
for documented CoreNLP PTB3 behavior (contraction/possessive splitting,
bracket normalization to -LRB- etc., quote conversion to ``/'', assimilation
splitting of cannot/gonna, abbreviation-aware sentence-internal period
splitting), plus the reference's own fake-results captions
(coco/results/captions_val2014_fakecap_results.json) whose simple grammar has
an unambiguous expected tokenization. Tokenization feeds every caption
metric; a drift that changes any of these outputs moves BLEU by >1e-4 on a
matched/unmatched n-gram, which is what this corpus is built to catch.

Deviations from CoreNLP, each either fixed or PROVEN score-neutral here:
* sentence-final acronyms — FIXED (round 4): CoreNLP emits "u.s." + a
  separate "." (post-drop token "u.s.", same as mid-sentence); Treebank's
  final-period rule gave "u.s", making the same word tokenize differently by
  position — NOT a consistent renaming, so it could move scores when gts/res
  used an acronym in different positions. tokenize_caption now reattaches
  the period (scoring path only; vocab building keeps NLTK semantics).
  test_acronym_cross_position_scores pins the cross-position match.
* PTB3 slash/star escaping ("50/50" -> "50\\/50", "*" -> "\\*" in CoreNLP;
  kept literal here) — a bijective, position-independent token renaming
  applied identically to gts and res; test_slash_star_escape_score_neutral
  asserts BLEU/CIDEr/ROUGE are bit-identical under both spellings.
"""

import json
import os
import re

import pytest

from adaptive_tpu.evalcap.ptbtokenizer import PTBTokenizer, tokenize_caption

FAKECAP = "/root/reference/coco/results/captions_val2014_fakecap_results.json"

# (input, expected CoreNLP `-preserveLines -lowerCase` output after the
# PUNCTUATIONS drop list)
CURATED = [
    # plain sentences / casing / whitespace
    ("A man riding a wave.", "a man riding a wave"),
    ("A MAN SHOUTING", "a man shouting"),
    ("  extra   spaces  here ", "extra spaces here"),
    ("", ""),
    # contractions: n't attaches to a truncated stem
    ("Don't stop believing", "do n't stop believing"),
    ("He can't swim", "he ca n't swim"),
    ("I won't go", "i wo n't go"),
    ("they aren't here", "they are n't here"),
    # clitics
    ("I'm happy, you're sad", "i 'm happy you 're sad"),
    ("they've been, we'll see, she'd go", "they 've been we 'll see she 'd go"),
    ("it's 3.5 meters", "it 's 3.5 meters"),
    # possessives: 's split and kept; bare trailing ' dropped (in punct list)
    ("The dog's ball", "the dog 's ball"),
    ("the teams' bus", "the teams bus"),
    # assimilations (PTB3 splits these)
    ("cannot do it", "can not do it"),
    ("gonna rain", "gon na rain"),
    ("'tis the season", "'t is the season"),
    # o'clock stays whole
    ("an o'clock meeting", "an o'clock meeting"),
    # quotes -> `` '' ` ' (all dropped)
    ('He said "hello world"', "he said hello world"),
    ("a 'red' kite", "a red kite"),
    ("rock 'n roll music", "rock 'n roll music"),
    ("he said 'hello there' loudly", "he said hello there loudly"),
    # brackets -> -LRB- -RRB- -LCB- -RCB- (dropped)
    ("A cat (sleeping) on a mat", "a cat sleeping on a mat"),
    ("sets {a} and [b]", "sets a and -LSB- b -RSB-"),  # -LSB-/-RSB- not in drop list
    # hyphens/dashes: hyphenated words whole; -- and - dropped as tokens
    ("Well-known artist", "well-known artist"),
    ("a b-day cake", "a b-day cake"),
    ("two--three people", "two three people"),
    ("a semi-trailer truck", "a semi-trailer truck"),
    # ellipsis dropped
    ("wait... what", "wait what"),
    ("A group of people... some are sitting.", "a group of people some are sitting"),
    # numbers, currency, percent
    ("1,000 dollars", "1,000 dollars"),
    ("a $5 bill", "a $ 5 bill"),
    ("50% off", "50 % off"),
    ("it is 3.5 meters tall. very tall.", "it is 3.5 meters tall very tall"),
    # list punctuation dropped
    ("A boy; a girl: both", "a boy a girl both"),
    ("one, two, and three!", "one two and three"),
    ("really!?", "really"),
    # ampersand kept
    ("black & white tv", "black & white tv"),
    # abbreviations keep their period; sentence-internal periods split+dropped
    ("mr. smith walks", "mr. smith walks"),
    ("Mr. and Mrs. Smith at the beach. They smile.",
     "mr. and mrs. smith at the beach they smile"),
    ("a no. 5 bus arrives. people board.", "a no. 5 bus arrives people board"),
    ("john f. kennedy airport. planes land.",
     "john f. kennedy airport planes land"),
    ("the u.s. flag", "the u.s. flag"),
    # sentence-final acronyms keep their period (CoreNLP: "u.s." + "." with
    # the terminator dropped), matching the mid-sentence form above
    ("he visits the u.s.", "he visits the u.s."),
    ("a sign reads u.s.a.", "a sign reads u.s.a."),
    ("it leaves at 3 p.m.", "it leaves at 3 p.m."),
    ("he visits the u.s. the flag waves.", "he visits the u.s. the flag waves"),
    # multi-sentence captions (real COCO captions contain these)
    ("A man. A dog.", "a man a dog"),
    ("A man sits. Then he stands. Done", "a man sits then he stands done"),
]


@pytest.mark.parametrize("text,want", CURATED, ids=range(len(CURATED)))
def test_corenlp_differential_curated(text, want):
    assert tokenize_caption(text) == want


@pytest.mark.skipif(not os.path.exists(FAKECAP), reason="reference fixtures absent")
def test_fakecap_corpus_tokenization():
    """The reference's 1000 fake-result captions: every caption made of plain
    words (letters/digits/spaces + optional final period) must tokenize to
    exactly its lowercased words — the unambiguous CoreNLP output."""
    caps = [r["caption"] for r in json.load(open(FAKECAP))]
    simple = [c for c in caps if re.fullmatch(r"[A-Za-z0-9 ]+\.?\s*", c)]
    assert len(simple) >= 800, f"fixture changed? only {len(simple)} simple captions"
    for c in simple:
        want = " ".join(c.strip().rstrip(".").lower().split())
        assert tokenize_caption(c) == want, c
    # the rest must at least round-trip the dict protocol without error
    out = PTBTokenizer().tokenize({i: [{"caption": c}] for i, c in enumerate(caps)})
    assert len(out) == len(caps)


def _score_all(gts, res):
    """(BLEU1-4, ROUGE_L, CIDEr) on already-tokenized corpora."""
    from adaptive_tpu.evalcap.bleu import Bleu
    from adaptive_tpu.evalcap.cider import Cider
    from adaptive_tpu.evalcap.rouge import Rouge

    bleu, _ = Bleu(4).compute_score(gts, res)
    rouge, _ = Rouge().compute_score(gts, res)
    cider, _ = Cider().compute_score(gts, res)
    return tuple(bleu) + (rouge, cider)


def test_acronym_cross_position_scores():
    """The round-4 fix's point: an acronym used sentence-finally in res and
    mid-sentence in gts (or vice versa) must n-gram-match. Pre-fix, res
    'the u.s.' tokenized to 'u.s' while gts 'u.s. flag' kept 'u.s.' — the
    unigram silently unmatched."""
    gts = {
        1: ["the u.s. flag waves in the wind", "a u.s. flag on a pole"],
        2: ["a clock shows 3 p.m. on a wall", "the time is 3 p.m. exactly"],
    }
    res = {1: ["a flag of the u.s."], 2: ["a wall clock at 3 p.m."]}
    gts_tok = {k: [tokenize_caption(c) for c in v] for k, v in gts.items()}
    res_tok = {k: [tokenize_caption(c) for c in v] for k, v in res.items()}
    # the acronym token is identical in both positions
    assert "u.s." in res_tok[1][0].split() and "u.s." in gts_tok[1][0].split()
    assert "p.m." in res_tok[2][0].split()
    # and identical to the hand-expected CoreNLP post-drop tokenization
    corenlp_res = {1: ["a flag of the u.s."], 2: ["a wall clock at 3 p.m."]}
    assert res_tok == corenlp_res
    # so the scores match CoreNLP's bit-for-bit
    assert _score_all(gts_tok, res_tok) == _score_all(gts_tok, corenlp_res)


def test_decimal_final_period_not_reattached():
    """Decimals are NOT in CoreNLP's abbreviation class: 'showing 1.30.'
    tokenizes as '1.30' + terminator in every position, so the acronym
    reattach must not fire on digit-dotted tokens — otherwise a res caption
    ending in a time/decimal ('1.30.') would carry '1.30.' while gts
    mid-sentence uses '1.30', silently unmatching the unigram."""
    final = tokenize_caption("a clock showing 1.30.")
    mid = tokenize_caption("a clock showing 1.30 at noon")
    assert final.split()[-1] == "1.30"
    assert "1.30" in mid.split()
    # the letter-acronym path still reattaches
    assert tokenize_caption("a flag of the u.s.").split()[-1] == "u.s."


def test_slash_star_escape_score_neutral():
    """PTB3 escaping ('50/50' -> '50\\/50', '*' -> '\\*') is a consistent,
    position-independent token renaming applied to gts and res alike —
    BLEU/ROUGE/CIDEr must be bit-identical under both spellings. This is the
    remaining documented CoreNLP deviation; this test is its neutrality
    proof on a slash/star-heavy corpus."""
    gts = {
        1: ["the crowd is split 50/50 about it", "a 50/50 mix of cats and dogs"],
        2: ["a sign with a * symbol on it", "the * marks a footnote"],
        3: ["an either/or choice on a menu", "a menu offers an either/or deal"],
    }
    res = {
        1: ["a 50/50 split crowd"],
        2: ["a * symbol on a sign"],
        3: ["an either/or menu choice"],
    }
    ours_gts = {k: [tokenize_caption(c) for c in v] for k, v in gts.items()}
    ours_res = {k: [tokenize_caption(c) for c in v] for k, v in res.items()}
    # the escaped tokens survive tokenization as single tokens on our side
    assert "50/50" in ours_res[1][0].split()
    esc = lambda s: s.replace("/", "\\/").replace("*", "\\*")
    corenlp_gts = {k: [esc(c) for c in v] for k, v in ours_gts.items()}
    corenlp_res = {k: [esc(c) for c in v] for k, v in ours_res.items()}
    assert corenlp_res != ours_res  # the corpora genuinely differ textually
    assert _score_all(ours_gts, ours_res) == _score_all(corenlp_gts, corenlp_res)


def test_sentence_splitter_units():
    from adaptive_tpu.data.tokenizer import split_sentences

    assert split_sentences("A man. A dog.") == ["A man.", "A dog."]
    assert split_sentences("mr. smith walks") == ["mr. smith walks"]
    assert split_sentences("wait... ok. go") == ["wait... ok.", "go"]
    assert split_sentences("the u.s. flag") == ["the u.s. flag"]
    assert split_sentences("") == []
