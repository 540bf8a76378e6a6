"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003).

Rolling Karp-Rabin hash over character k-grams, then the minimum hash
per sliding window of ``w`` consecutive k-gram hashes (rightmost-min
rule) — the classic MOSS scheme. Exposed as an Arrow pandas UDF; the
pure-Python core is importable for the reference tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

K = 5  # k-gram length (chars)
W = 4  # winnow window (hashes)
_BASE = 257
_MOD = (1 << 61) - 1


def winnow(text: str, k: int = K, w: int = W) -> list[int]:
    """Sorted distinct winnowed fingerprints of ``text``."""
    s = " ".join(text.lower().split())
    n = len(s)
    if n < k:
        return []
    # rolling Karp-Rabin over k-grams
    hashes = []
    h = 0
    power = pow(_BASE, k - 1, _MOD)
    for i, ch in enumerate(s):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= k:
            h = (h - ord(s[i - k]) * power * _BASE) % _MOD
        if i >= k - 1:
            hashes.append(h)
    if len(hashes) <= w:
        return sorted({min(hashes)}) if hashes else []
    picked: set[int] = set()
    for start in range(len(hashes) - w + 1):
        window = hashes[start : start + w]
        m = min(window)
        # rightmost occurrence of the minimum (winnowing rule)
        idx = len(window) - 1 - window[::-1].index(m)
        picked.add(window[idx])
    return sorted(picked)


@pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprints(s: pd.Series) -> pd.Series:
    return s.map(lambda t: None if t is None else winnow(t))
