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

Documented deviations from CoreNLP (both rare-to-absent in COCO captions and
consistent across gts/res so scores are unaffected): sentence-final acronyms
("the u.s." -> "u.s" here, "u.s." + extra "." in CoreNLP) and PTB3 slash/star
escaping ("50/50" -> "50\\/50" in CoreNLP, kept literal here).
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


def test_sentence_splitter_units():
    from adaptive_tpu.data.tokenizer import split_sentences

    assert split_sentences("A man. A dog.") == ["A man.", "A dog."]
    assert split_sentences("mr. smith walks") == ["mr. smith walks"]
    assert split_sentences("wait... ok. go") == ["wait... ok.", "go"]
    assert split_sentences("the u.s. flag") == ["the u.s. flag"]
    assert split_sentences("") == []
