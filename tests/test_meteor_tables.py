"""tools/meteor_tables.py: real-data METEOR table ingestion, fixture-driven.

The reference's meteor-1.5 data (WordNet, paraphrase-en.gz) are missing
large blobs (/root/reference/.MISSING_LARGE_BLOBS:2-3); this tool converts
those formats into MatchTables inputs the moment real data lands. Fixtures
below reproduce the documented WordNet 3.x wndb(5) data-file layout and the
PPDB / meteor-style paraphrase line formats.
"""

import gzip
import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mt():
    spec = importlib.util.spec_from_file_location(
        "meteor_tables", os.path.join(_REPO, "tools", "meteor_tables.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# WordNet 3.x data.noun layout (wndb(5)): header lines start with whitespace;
# synset lines are `offset lex_filenum ss_type w_cnt(hex) word lex_id ...`.
WORDNET_NOUN = """\
  1 This software and database is being provided to you, the LICENSEE, ...
  2 (a second license-header line that must be skipped)
02084071 05 n 04 dog 0 domestic_dog 0 canis_familiaris 0 puppy 0 013 @ 01317541 n 0000 | a member of the genus Canis
02121620 05 n 02 cat 0 true_cat 0 007 @ 01317541 n 0000 | feline mammal
04105068 06 n 02 sofa 0 couch 0 002 @ 04161981 n 0000 | an upholstered seat
00001740 03 n 01 entity 0 001 ~ 00001930 n 0000 | that which is perceived
"""

# data.adj with syntactic-position markers on lemmas.
WORDNET_ADJ = """\
  1 header
00001740 00 a 02 beautiful 0 pretty(p) 0 002 & 00002098 a 0000 | pleasing
"""


def test_wordnet_parse(mt):
    synsets = mt.parse_wordnet_data(WORDNET_NOUN.splitlines())
    # multi-word lemmas (domestic_dog, canis_familiaris, true_cat) skipped;
    # single-member synsets (entity; cat after filtering) dropped
    assert ["dog", "puppy"] in synsets
    assert ["sofa", "couch"] in synsets
    assert all("cat" not in s for s in synsets)
    assert all("entity" not in s for s in synsets)

    adj = mt.parse_wordnet_data(WORDNET_ADJ.splitlines())
    assert adj == [["beautiful", "pretty"]]  # (p) marker stripped


def test_wordnet_convert_and_load(mt, tmp_path):
    d = tmp_path / "dict"
    d.mkdir()
    (d / "data.noun").write_text(WORDNET_NOUN)
    (d / "data.adj").write_text(WORDNET_ADJ)
    out = tmp_path / "synonyms.txt"
    n = mt.convert_wordnet(str(d), str(out))
    assert n == 3

    from adaptive_tpu.evalcap.meteor import MatchTables

    tables = MatchTables.load(synonyms_path=str(out))
    assert tables.synonymous("dog", "puppy")
    assert tables.synonymous("couch", "sofa")
    assert tables.synonymous("beautiful", "pretty")
    assert not tables.synonymous("dog", "cat")
    assert not tables.synonymous("dog", "sofa")


def test_wordnet_missing_dir_raises(mt, tmp_path):
    with pytest.raises(FileNotFoundError):
        mt.convert_wordnet(str(tmp_path), str(tmp_path / "o.txt"))


PPDB_LINES = """\
[VB] ||| survived ||| lived ||| PPDB2.0Score=4.5 SomeOther=1.0 ||| 0-0
[NN] ||| next to ||| beside ||| PPDB2.0Score=2.0 ||| 0-0 1-0
[NN] ||| couch ||| sofa ||| PPDB2.0Score=5.1 ||| 0-0
0.9 ||| on top of ||| atop
0.1 ||| giraffe ||| elephant
frisbee ||| flying disc
malformed line without separators
[X] ||| Bad Caps Phrase! ||| ok phrase ||| PPDB2.0Score=9.9 ||| 0-0
[X] ||| same ||| same ||| PPDB2.0Score=9.9 ||| 0-0
[X] ||| a very long phrase of many words here ||| short ||| PPDB2.0Score=9.9 ||| 0-0
"""


def test_paraphrase_parse_autodetect(mt):
    pairs = set(mt.parse_paraphrase_lines(PPDB_LINES.splitlines(), min_score=0.5))
    assert ("survived", "lived") in pairs or ("lived", "survived") in pairs
    assert ("couch", "sofa") in pairs
    assert ("on top of", "atop") in pairs  # meteor-style prob line, 0.9 >= 0.5
    assert ("frisbee", "flying disc") in pairs  # scoreless: always passes
    flat = {w for pair in pairs for w in pair}
    assert "giraffe" not in flat  # 0.1 < min_score
    assert "same" not in flat  # identity pair dropped
    assert not any("bad" in a or "Bad" in a for a, _ in pairs)  # '!' rejected
    assert all(len(a.split()) <= 4 and len(b.split()) <= 4 for a, b in pairs)


def test_paraphrase_two_field_floaty_phrase_is_plain(mt):
    """A plain two-field pair whose left phrase happens to parse as a float
    ('nan ||| grandmother' — float('nan') parses; same for 'inf' or '12')
    must not be misread as a meteor-style probability column and silently
    dropped: two fields is always the plain layout."""
    pairs = set(mt.parse_paraphrase_lines(["nan ||| grandmother"], min_score=0.5))
    assert ("nan", "grandmother") in pairs


def test_paraphrase_min_score_filters_ppdb(mt):
    pairs = set(mt.parse_paraphrase_lines(PPDB_LINES.splitlines(), min_score=3.0))
    flat = {w for pair in pairs for w in pair}
    assert "beside" not in flat  # PPDB2.0Score=2.0 < 3.0
    assert "atop" not in flat  # prob 0.9 < 3.0
    assert ("couch", "sofa") in pairs


def test_paraphrase_convert_gz_and_score(mt, tmp_path):
    src = tmp_path / "ppdb.gz"
    with gzip.open(src, "wt", encoding="utf-8") as f:
        f.write(PPDB_LINES)
    out = tmp_path / "paraphrases.txt"
    n = mt.convert_paraphrases(str(src), str(out), min_score=0.5)
    assert n >= 4

    from adaptive_tpu.evalcap.meteor import MatchTables, sentence_meteor

    tables = MatchTables.load(paraphrases_path=str(out))
    assert tables.max_phrase >= 3  # "on top of"
    # the ingested table activates stage 4: paraphrase match beats no-table
    hyp, ref = "a cat on top of a couch", "a cat atop a sofa"
    assert sentence_meteor(hyp, ref, tables) > sentence_meteor(hyp, ref, None)


def test_cli_end_to_end(mt, tmp_path):
    d = tmp_path / "dict"
    d.mkdir()
    (d / "data.noun").write_text(WORDNET_NOUN)
    syn_out = tmp_path / "syn.txt"
    assert mt.main(["wordnet", "--dict-dir", str(d), "-o", str(syn_out)]) == 0
    ppdb = tmp_path / "ppdb.txt"
    ppdb.write_text(PPDB_LINES)
    para_out = tmp_path / "para.txt"
    assert mt.main(
        ["paraphrase", "--input", str(ppdb), "-o", str(para_out), "--min-score", "3.0"]
    ) == 0

    # the produced files slot straight into the production env-var hookup
    # (meteor.py::default_tables resolution order)
    from adaptive_tpu.evalcap.meteor import default_tables

    old = {k: os.environ.get(k) for k in
           ("ADAPTIVE_TPU_METEOR_SYNONYMS", "ADAPTIVE_TPU_METEOR_PARAPHRASES",
            "ADAPTIVE_TPU_METEOR_TABLES")}
    try:
        os.environ.pop("ADAPTIVE_TPU_METEOR_TABLES", None)
        os.environ["ADAPTIVE_TPU_METEOR_SYNONYMS"] = str(syn_out)
        os.environ["ADAPTIVE_TPU_METEOR_PARAPHRASES"] = str(para_out)
        tables = default_tables(refresh=True)
        assert tables.synonymous("dog", "puppy")
        assert "sofa" in tables.paraphrases.get("couch", set())
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        default_tables(refresh=True)
