"""NGram / EdgeNGram token filters.

Re-expresses ``analysis/common/.../ngram/NGramTokenFilter.java`` and
``EdgeNGramTokenFilter.java``:

  - NGram: every contained gram with length in [minGram, maxGram], ordered
    by (start, size); Edge: prefixes with length in [minGram, maxGram].
  - All of a token's outputs share its position (first gram carries the
    increment, the rest stack at increment 0) — in this engine's absolute
    position model they all sit at the token's position.
  - A token yielding no grams is dropped and leaves a position hole (its
    increment accumulates onto the next surviving token, exactly the
    reference's ``curPosIncr`` bookkeeping).
  - ``preserve_original``: tokens shorter than minGram are kept as-is;
    tokens longer than maxGram are additionally emitted AFTER their grams.
  - Norm contract: with ``BM25Similarity.discountOverlaps`` (default) the
    effective per-doc length is the number of tokens with increment > 0 =
    the number of input tokens that emitted at least one output; doc_lens
    are recomputed accordingly.

Scale shape: gram generation runs at the VOCABULARY level (each distinct
surface form expands once — the stream is dictionary-encoded anyway), the
stream multiplication is two ``np.repeat`` calls; no shuffle, no driver
state, same invert-task locality as the analyzer.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import AnalyzedBatch

__all__ = ["NGramFilter", "EdgeNGramFilter", "ngram_expand"]


@dataclass(frozen=True)
class NGramFilter:
    min_gram: int
    max_gram: int
    preserve_original: bool = False
    edge: bool = False

    def __post_init__(self):
        # the reference constructors' validation
        if self.min_gram < 1:
            raise ValueError("minGram must be greater than zero")
        if self.min_gram > self.max_gram:
            raise ValueError("minGram must not be greater than maxGram")

    def grams(self, t: str) -> list[str]:
        n = len(t)  # Python str length == code point count
        if n < self.min_gram:
            return [t] if self.preserve_original else []
        out: list[str] = []
        if self.edge:
            for g in range(self.min_gram, min(self.max_gram, n) + 1):
                out.append(t[:g])
        else:
            for pos in range(n):
                for g in range(self.min_gram, self.max_gram + 1):
                    if pos + g > n:
                        break
                    out.append(t[pos:pos + g])
        if self.preserve_original and n > self.max_gram:
            out.append(t)
        return out

    def apply(self, batch: AnalyzedBatch) -> AnalyzedBatch:
        return ngram_expand(batch, self)

    def fingerprint(self) -> str:
        h = hashlib.md5()
        h.update(repr(("ngram", self.min_gram, self.max_gram,
                       self.preserve_original, self.edge)).encode())
        return h.hexdigest()


def EdgeNGramFilter(min_gram: int, max_gram: int,
                    preserve_original: bool = False) -> NGramFilter:
    return NGramFilter(min_gram, max_gram, preserve_original, edge=True)


def ngram_expand(batch: AnalyzedBatch, f: NGramFilter) -> AnalyzedBatch:
    if batch.tok_starts is not None or batch.tok_payloads is not None:
        raise ValueError("ngram expansion composes with neither offsets nor "
                         "payload analysis")
    n_tok = len(batch.tok_doc_idx)
    if n_tok == 0:
        return batch
    dict_enc = pc.dictionary_encode(batch.tok_terms_pa)
    codes = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(
        dict_enc.dictionary.to_numpy(zero_copy_only=False), dtype=object
    )
    per_code = [f.grams(t) for t in vocab]            # vocabulary-level work
    counts = np.array([len(g) for g in per_code], dtype=np.int64)
    flat = np.array(
        [g for gs in per_code for g in gs] or [], dtype=object
    )
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rep = counts[codes]
    total = int(rep.sum())
    new_doc = np.repeat(batch.tok_doc_idx, rep)
    new_pos = np.repeat(batch.tok_positions, rep)
    # index into flat: per-token range [offsets[code], offsets[code]+rep)
    starts = np.repeat(offsets[codes], rep)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(rep)[:-1])), rep
    )
    new_terms = flat[starts + within] if total else flat
    # effective length = tokens emitting >= 1 output (overlap discounting)
    survivors = batch.tok_doc_idx[rep > 0]
    doc_lens = (
        np.bincount(survivors, minlength=batch.n_docs).astype(np.int32)
        if len(survivors)
        else np.zeros(batch.n_docs, dtype=np.int32)
    )
    return AnalyzedBatch(
        n_docs=batch.n_docs,
        doc_lens=doc_lens,
        tok_doc_idx=new_doc,
        tok_terms_pa=pa.array(new_terms, type=pa.string()),
        tok_positions=new_pos,
    )
