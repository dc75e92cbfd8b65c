"""Caption tokenization for vocabulary building and training data.

Reference parity: the reference tokenizes captions with
``nltk.tokenize.word_tokenize(caption.lower())`` and drops single-character
punctuation tokens (reference code_src/data/build_vocab.py:37,
code_src/data/data_loader.py:51). NLTK's word_tokenize is the Treebank word
tokenizer applied per sentence; captions are single sentences, so the
data-free ``TreebankWordTokenizer`` reproduces it. A clean-room regex
fallback with the same core rules is used if NLTK is unavailable.
"""

from __future__ import annotations

import re
import string
from typing import List

_PUNCT = set(string.punctuation)

try:  # pure-regex tokenizer, needs no downloaded data
    from nltk.tokenize import TreebankWordTokenizer

    _TREEBANK = TreebankWordTokenizer()
except Exception:  # pragma: no cover - nltk is normally present
    _TREEBANK = None


# Clean-room Treebank-style rules (subset sufficient for lowercased captions):
# split off punctuation, keep contractions as separate 's / n't / 're etc.
_CONTRACTIONS = re.compile(r"(?i)\b(\w+)(n't)\b")
_POSSESSIVE = re.compile(r"(?i)(\w)('s|'re|'ve|'ll|'d|'m|')(?=\s|$)")
_WORD_RE = re.compile(r"\w+|[^\w\s]")


def _fallback_tokenize(text: str) -> List[str]:
    text = _CONTRACTIONS.sub(r"\1 \2", text)
    text = _POSSESSIVE.sub(r"\1 \2", text)
    return _WORD_RE.findall(text)


def word_tokenize(text: str) -> List[str]:
    """Treebank-style word tokenization (single-sentence assumption)."""
    if _TREEBANK is not None:
        return _TREEBANK.tokenize(text)
    return _fallback_tokenize(text)


def caption_tokenize(caption: str) -> List[str]:
    """Lowercase, tokenize, drop punctuation tokens (build_vocab.py:37)."""
    return [w for w in word_tokenize(str(caption).lower()) if w not in _PUNCT]
