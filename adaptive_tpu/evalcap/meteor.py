"""METEOR — clean-room Python implementation (no Java, no paraphrase table).

Reference parity note: the reference drives ``meteor-1.5.jar`` over a stdio
protocol (coco/pycocoevalcap/meteor/meteor.py:15-82), but the jar and its
paraphrase-en.gz table are missing large blobs (.MISSING_LARGE_BLOBS:2-3), so
the reference as-shipped cannot run METEOR either. This implementation follows
the published METEOR algorithm (Denkowski & Lavie 2014) with the English
defaults alpha=0.85, beta=0.2, gamma=0.6 and the exact + Porter-stem matcher
stages (weights 1.0, 0.6). Deviations, by necessity of the missing data
files: no WordNet synonymy, no paraphrase stage, no function-word
discounting — scores track real METEOR closely but are not bit-identical.

score = (1 - gamma * frag^beta) * P*R / (alpha*P + (1-alpha)*R),
frag = chunks / matches; max over references per image.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

try:
    from nltk.stem.porter import PorterStemmer

    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    def _STEM(w: str) -> str:
        for suf in ("ing", "ed", "es", "s"):
            if w.endswith(suf) and len(w) > len(suf) + 2:
                return w[: -len(suf)]
        return w

ALPHA, BETA, GAMMA = 0.85, 0.2, 0.6
WEIGHT_EXACT, WEIGHT_STEM = 1.0, 0.6


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, float]]:
    """One-to-one alignment (hyp_idx, ref_idx, weight): exact stage then stem
    stage on leftovers, each leftmost-greedy (METEOR's beam search reduces to
    this for the common caption case)."""
    matches: List[Tuple[int, int, float]] = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)

    def stage(key_h: List[str], key_r: List[str], w: float):
        for i, kh in enumerate(key_h):
            if used_h[i]:
                continue
            for j, kr in enumerate(key_r):
                if not used_r[j] and kh == kr:
                    matches.append((i, j, w))
                    used_h[i] = True
                    used_r[j] = True
                    break

    stage(hyp, ref, WEIGHT_EXACT)
    stage([_STEM(w) for w in hyp], [_STEM(w) for w in ref], WEIGHT_STEM)
    return matches


def _chunks(matches: List[Tuple[int, int, float]]) -> int:
    """Number of maximal runs contiguous in both hyp and ref order."""
    if not matches:
        return 0
    ms = sorted(matches)
    ch = 1
    for (h0, r0, _), (h1, r1, _) in zip(ms, ms[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            ch += 1
    return ch


def sentence_meteor(hyp_str: str, ref_str: str) -> float:
    hyp, ref = hyp_str.split(), ref_str.split()
    if not hyp or not ref:
        return 0.0
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0:
        return 0.0
    wm = sum(w for _, _, w in matches)
    P = wm / len(hyp)
    R = wm / len(ref)
    fmean = P * R / (ALPHA * P + (1 - ALPHA) * R)
    frag = _chunks(matches) / m
    pen = GAMMA * (frag**BETA) if m > 0 else 0.0
    # METEOR defines penalty 0 when everything is one chunk of full length
    if _chunks(matches) == 1 and m == len(hyp) == len(ref):
        pen = 0.0
    return (1 - pen) * fmean


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
