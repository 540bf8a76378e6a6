"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003).

Polynomial hash over character k-grams (base 257, natural mod-2^64
wraparound — numpy's uint64 arithmetic IS the modulus, so the hot path
vectorizes), then the minimum hash per sliding window of ``w``
consecutive k-gram hashes — the classic MOSS scheme.

Because the output is the *set* of picked fingerprints, the winnowing
rightmost-min tie rule only affects picked *positions*, never values:
the picked value in every window equals the window minimum. The whole
scheme therefore collapses to ``unique(sliding_min(hashes, w))``,
which runs as three numpy kernels per document instead of a
per-character Python loop (measured ~8× on the sf0.1 corpus).

Exposed as an Arrow pandas UDF; the pure-Python ``winnow`` reference
(independent scalar re-implementation, no numpy) is importable for the
lockstep tests in tests/test_llm_ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

K = 5  # k-gram length (chars)
W = 4  # winnow window (hashes)
_BASE = 257
_M64 = (1 << 64) - 1


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def winnow(text: str, k: int = K, w: int = W) -> list[int]:
    """Sorted distinct winnowed fingerprints of ``text`` (pure-Python
    reference; hashes are signed int64 views of the mod-2^64 values)."""
    s = " ".join(text.lower().split())
    n = len(s)
    if n < k:
        return []
    hashes = []
    for i in range(n - k + 1):
        h = 0
        for ch in s[i : i + k]:
            h = (h * _BASE + ord(ch)) & _M64
        hashes.append(h)
    if len(hashes) <= w:
        picked = {min(hashes)}
    else:
        picked = {
            min(hashes[start : start + w])
            for start in range(len(hashes) - w + 1)
        }
    return sorted(_signed(h) for h in picked)


def _winnow_np(text: str) -> np.ndarray:
    """Vectorized winnowing core: k tap multiply-adds for the k-gram
    hashes, one strided sliding-min, one unique."""
    s = " ".join(text.lower().split())
    if len(s) < K:
        return np.empty(0, dtype=np.int64)
    c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = len(c) - K + 1
    h = np.zeros(m, dtype=np.uint64)
    base = np.uint64(_BASE)
    for j in range(K):
        h = h * base + c[j : j + m]  # uint64 wraparound == mod 2^64
    if m <= W:
        mins = h.min(keepdims=True)
    else:
        mins = np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
    return np.sort(np.unique(mins).view(np.int64))


@pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprints(s: pd.Series) -> pd.Series:
    return s.map(lambda t: None if t is None else _winnow_np(t))
