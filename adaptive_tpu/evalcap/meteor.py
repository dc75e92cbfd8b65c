"""METEOR 1.5 — clean-room Python implementation (no Java).

Reference parity note: the reference drives ``meteor-1.5.jar`` over a stdio
protocol (coco/pycocoevalcap/meteor/meteor.py:15-82), but the jar and its
paraphrase-en.gz table are missing large blobs (.MISSING_LARGE_BLOBS:2-3), so
the reference as-shipped cannot run METEOR either. This implements the
published Meteor 1.5 algorithm (Denkowski & Lavie 2014) with the English
defaults alpha=0.85, beta=0.2, gamma=0.6, delta=0.75:

* matcher stages exact (weight 1.0) and Porter stem (0.6);
* alignment resolution by beam search over match permutations with Meteor's
  comparator — maximize matched words, then minimize chunks, then maximize
  match weight, then minimize total position distance (the jar's Aligner
  semantics; NOT leftmost-greedy);
* function-word discounting: content words weigh delta, function words
  (1-delta) in weighted precision/recall (the jar derives its list from
  corpus frequency > 1e-3; the closed-class list below is the derivable
  approximation);
* fragmentation penalty gamma * (chunks/matches)^beta, no special cases.

Remaining deviations, by necessity of the missing data files only: no WordNet
synonymy stage (weight 0.8) and no paraphrase stage (weight 0.6).

score = (1 - gamma * frag^beta) * P*R / (alpha*P + (1-alpha)*R),
max over references per image (the jar scores each ref and keeps the best).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

try:
    from nltk.stem.porter import PorterStemmer

    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    def _STEM(w: str) -> str:
        for suf in ("ing", "ed", "es", "s"):
            if w.endswith(suf) and len(w) > len(suf) + 2:
                return w[: -len(suf)]
        return w

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
WEIGHT_EXACT, WEIGHT_STEM = 1.0, 0.6
BEAM = 40  # the jar's default beam width

# Closed-class English words (approximates meteor-1.5's frequency-derived
# function.words list: articles, conjunctions, prepositions, pronouns,
# auxiliaries, common adverbial particles, clitics).
FUNCTION_WORDS = frozenset("""
a an the and or but nor if then than so because while although though
of in on at by for with from to into onto over under up down out off
about above across after against along among around before behind below
beneath beside between beyond during except inside near outside through
toward towards upon within without
is are was were be been being am do does did done doing have has had having
will would can could shall should may might must
it its he she his her hers him they them their theirs we us our ours you
your yours i me my mine this that these those there here who whom whose
which what when where why how
not no yes all any both each few more most other some such only own same
as too very just also
's 't 're 've 'll 'd 'm n't '
""".split())


Match = Tuple[int, int, float]  # (hyp_idx, ref_idx, stage weight)


def _candidates(hyp: Sequence[str], ref: Sequence[str]) -> List[List[Tuple[int, float]]]:
    """Per hyp position: possible (ref position, weight) matches. Each pair is
    tagged by its highest-priority matcher (exact beats stem)."""
    sh = [_STEM(w) for w in hyp]
    sr = [_STEM(w) for w in ref]
    out: List[List[Tuple[int, float]]] = []
    for i, w in enumerate(hyp):
        row = []
        for j, r in enumerate(ref):
            if w == r:
                row.append((j, WEIGHT_EXACT))
            elif sh[i] == sr[j]:
                row.append((j, WEIGHT_STEM))
        out.append(row)
    return out


class _State:
    __slots__ = ("mask", "prev", "chunks", "m", "wsum", "dist", "matches")

    def __init__(self, mask, prev, chunks, m, wsum, dist, matches):
        self.mask = mask        # bitmask of used ref positions
        self.prev = prev        # last matched (hyp_idx, ref_idx) or None
        self.chunks = chunks
        self.m = m              # matched word count
        self.wsum = wsum        # sum of stage weights
        self.dist = dist        # sum |i - j| over matches
        self.matches = matches  # tuple of Match

    def key(self):
        # Meteor's alignment comparator: most matches, fewest chunks,
        # highest stage weight, smallest distance.
        return (-self.m, self.chunks, -self.wsum, self.dist)


def _align(hyp: Sequence[str], ref: Sequence[str]) -> List[Match]:
    """One-to-one alignment via beam search (the jar's Aligner semantics)."""
    cands = _candidates(hyp, ref)
    beam = [_State(0, None, 0, 0, 0.0, 0, ())]
    for i in range(len(hyp)):
        nxt = list(beam)  # leaving hyp[i] unmatched keeps the state as-is
        for st in beam:
            for j, w in cands[i]:
                if st.mask >> j & 1:
                    continue
                contiguous = st.prev == (i - 1, j - 1)
                nxt.append(
                    _State(
                        st.mask | (1 << j),
                        (i, j),
                        st.chunks + (0 if contiguous else 1),
                        st.m + 1,
                        st.wsum + w,
                        st.dist + abs(i - j),
                        st.matches + ((i, j, w),),
                    )
                )
        nxt.sort(key=_State.key)
        beam = nxt[:BEAM]
    return list(beam[0].matches)


def _chunks(matches: List[Match]) -> int:
    """Number of maximal runs contiguous in both hyp and ref order."""
    if not matches:
        return 0
    ms = sorted(matches)
    ch = 1
    for (h0, r0, _), (h1, r1, _) in zip(ms, ms[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            ch += 1
    return ch


def _weighted_side(words: Sequence[str], idx_weights: Dict[int, float]) -> Tuple[float, float]:
    """(weighted matched mass, weighted total mass) with delta-discounted
    function words, for one side (hyp or ref)."""
    content_total = sum(1 for w in words if w not in FUNCTION_WORDS)
    function_total = len(words) - content_total
    mc = sum(w for i, w in idx_weights.items() if words[i] not in FUNCTION_WORDS)
    mf = sum(w for i, w in idx_weights.items() if words[i] in FUNCTION_WORDS)
    matched = DELTA * mc + (1 - DELTA) * mf
    total = DELTA * content_total + (1 - DELTA) * function_total
    return matched, total


def sentence_meteor(hyp_str: str, ref_str: str) -> float:
    hyp, ref = hyp_str.split(), ref_str.split()
    if not hyp or not ref:
        return 0.0
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0:
        return 0.0
    mh, th = _weighted_side(hyp, {i: w for i, _, w in matches})
    mr, tr = _weighted_side(ref, {j: w for _, j, w in matches})
    if th == 0 or tr == 0 or mh == 0 or mr == 0:
        return 0.0
    P, R = mh / th, mr / tr
    fmean = P * R / (ALPHA * P + (1 - ALPHA) * R)
    frag = _chunks(matches) / m
    return (1 - GAMMA * frag**BETA) * fmean


class Meteor:
    def method(self) -> str:
        return "METEOR"

    def compute_score(self, gts: Dict, res: Dict):
        assert gts.keys() == res.keys()
        scores = [
            max(sentence_meteor(res[iid][0], ref) for ref in gts[iid]) for iid in gts.keys()
        ]
        mean = sum(scores) / len(scores) if scores else 0.0
        return mean, scores
