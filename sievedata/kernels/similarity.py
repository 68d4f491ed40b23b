"""String-similarity kernels, implemented from scratch.

The reference uses ``rapidfuzz.distance.JaroWinkler.normalized_similarity``
(/root/reference/app/features.py:39,43-44) and a char-3-gram Dice coefficient
(/root/reference/app/main.py:205-208,290-296).  rapidfuzz is not available
here, so Jaro-Winkler is a standard from-scratch implementation (prefix
weight 0.1, max common prefix 4 — the textbook/rapidfuzz defaults).
"""
from __future__ import annotations

from typing import Iterable


def _jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler normalized similarity in [0, 1]."""
    jaro = _jaro(s1, s2)
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1, s2):
            if a != b or prefix == 4:
                break
            prefix += 1
        jaro += prefix * prefix_weight * (1.0 - jaro)
    return jaro


def ngram_set(text: str, n: int = 3) -> set[str]:
    """Char n-gram set; empty set when len < n.
    Ref: app/main.py:205-208 (_ngram_slices)."""
    if len(text) < n:
        return set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def dice_3gram(a_text: str, b_text: str) -> float:
    """min(1, 2·|A∩B| / max(|A|+|B|, 1)) over char-3-gram sets — the
    reference's 'text_cosine' proxy.  Ref: app/main.py:290-296."""
    a = ngram_set(a_text)
    b = ngram_set(b_text)
    overlap = len(a & b)
    denom = max(len(a) + len(b), 1)
    return float(min(1.0, 2.0 * overlap / denom))


def jaccard(a: Iterable, b: Iterable) -> float:
    """Plain Jaccard similarity over two iterables of hashables."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


def shingle_jaccard(a_text: str, b_text: str, n: int = 3) -> float:
    """Char n-gram Jaccard — RR-003's near-dup measure for media payloads."""
    return jaccard(ngram_set(a_text, n), ngram_set(b_text, n))
