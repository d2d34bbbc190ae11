"""BM25 scoring with Lucene's exact float32 semantics.

Re-expresses the reference's ``core/search/similarities/BM25Similarity.java``:
  - idf  = (float) log(1 + (N - n + 0.5)/(n + 0.5))            (:104-106)
  - avgdl = (float) (sumTotalTermFreq / (double) docCount)     (:109-111)
  - cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))  (:205-208)
  - weight = boost * idf                                       (float mult)
  - score  = weight - weight / (1 + freq * cache[norm])        (:240-252)

All marked operations are IEEE binary32. numpy float32 arithmetic rounds each
op to binary32 exactly like the JVM, so scores here are bit-identical to
Lucene's. Multi-term (phrase/synonym) idf is summed as double over the float
per-term idfs, then cast to float (:185-194).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["idf", "avgdl", "norm_cache", "BM25Scorer", "K1", "B"]

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """float-cast of a double-precision log expression."""
    return np.float32(math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def idf_sum(idfs: list[np.float32]) -> np.float32:
    """Phrase/synonym idf: sum float idfs in double, cast once to float."""
    return np.float32(sum(float(x) for x in idfs))


def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_cache(avg_dl: np.float32, k1: np.float32 = K1, b: np.float32 = B) -> np.ndarray:
    """256-entry float32 cache of 1 / (k1 * ((1-b) + b * dl / avgdl)).

    Every intermediate op is a float32 op, matching the Java expression's
    evaluation order: ((1-b) + ((b * dl) / avgdl)) then * k1 then 1/x.
    """
    one = np.float32(1.0)
    dl = LENGTH_TABLE.astype(np.float32)  # float cast of decoded lengths
    inner = (one - b) + (b * dl) / avg_dl  # float32 ops, Java eval order
    # k1=0 gives cache=+inf; score w - w/(1 + f*inf) = w, matching Java's
    # 1f/0f = Infinity semantics — the inf is intentional, not an error.
    with np.errstate(divide="ignore"):
        return (one / (k1 * inner)).astype(np.float32)


@dataclass
class BM25Scorer:
    """Per-term scorer; mirrors BM25Similarity.BM25Scorer."""

    weight: np.float32  # boost * idf, float32
    cache: np.ndarray  # float32[256] norm-inverse cache

    @classmethod
    def build(
        cls,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        k1: np.float32 = K1,
        b: np.float32 = B,
    ) -> "BM25Scorer":
        w = np.float32(boost) * idf(doc_freq, doc_count)
        return cls(weight=w, cache=norm_cache(avgdl(sum_total_term_freq, doc_count), k1, b))

    def score(self, freqs: np.ndarray, norms: np.ndarray) -> np.ndarray:
        """Vectorized float32 ``weight - weight / (1 + freq * cache[norm])``.

        freqs: int array; norms: uint8 array of encoded norm bytes.
        """
        one = np.float32(1.0)
        norm_inv = self.cache[norms.astype(np.uint8)]
        f = freqs.astype(np.float32)
        return self.weight - self.weight / (one + f * norm_inv)

    def max_score(self, impacts: "list[tuple[int, int]] | np.ndarray") -> np.float32:
        """Upper bound over a block's (freq, norm) impact frontier."""
        arr = np.asarray(impacts, dtype=np.int64).reshape(-1, 2)
        if arr.size == 0:
            return np.float32(np.inf)
        s = self.score(arr[:, 0], arr[:, 1].astype(np.uint8))
        return np.float32(s.max())
