"""Miscellaneous token filters (stream-level, `build_index(stream_filter=)`).

LengthFilter re-expresses
``analysis/common/.../miscellaneous/LengthFilter.java``: keep tokens whose
code-point length is within [min, max]; removed tokens leave position
holes (FilteringTokenFilter's enablePositionIncrements semantics — the
same hole discipline as the stop filter) and drop out of the length norm.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import AnalyzedBatch

__all__ = ["LengthFilter"]


@dataclass(frozen=True)
class LengthFilter:
    min_len: int
    max_len: int

    def __post_init__(self):
        # the reference ctor's validation (LengthFilter.java:38-45)
        if self.min_len < 0:
            raise ValueError("minimum length must be greater than or equal "
                             "to zero")
        if self.min_len > self.max_len:
            raise ValueError("maximum length must not be greater than "
                             "minimum length")

    def apply(self, batch: AnalyzedBatch) -> AnalyzedBatch:
        if batch.tok_starts is not None or batch.tok_payloads is not None:
            raise ValueError("LengthFilter composes with neither offsets "
                             "nor payload analysis")
        lens = pc.utf8_length(batch.tok_terms_pa).to_numpy(
            zero_copy_only=False
        )
        keep = (lens >= self.min_len) & (lens <= self.max_len)
        if keep.all():
            return batch
        doc = batch.tok_doc_idx[keep]
        doc_lens = (
            np.bincount(doc, minlength=batch.n_docs).astype(np.int32)
            if len(doc)
            else np.zeros(batch.n_docs, dtype=np.int32)
        )
        return AnalyzedBatch(
            n_docs=batch.n_docs,
            doc_lens=doc_lens,
            tok_doc_idx=doc,
            tok_terms_pa=pc.filter(batch.tok_terms_pa, pa.array(keep)),
            tok_positions=batch.tok_positions[keep],
        )

    def fingerprint(self) -> str:
        h = hashlib.md5()
        h.update(repr(("length", self.min_len, self.max_len)).encode())
        return h.hexdigest()


@dataclass(frozen=True)
class StemRepeatFilter:
    """KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter — the
    reference idiom for indexing BOTH the surface form and its stem
    (``analysis/common/.../miscellaneous/KeywordRepeatFilter.java``: each
    token emitted twice, the keyword-marked copy skipping the stemmer;
    ``RemoveDuplicatesTokenFilter`` then drops the pair when the stem
    equals the surface).

    Net indexed stream: every token, plus its stem stacked at the same
    position when the stem differs (increment 0 — an overlap, discounted
    from the length norm like any stacked token). The stemming runs at
    the VOCABULARY level (each distinct surface form once).

    ``stemmer``: term -> term callable (e.g. functions/stem.porter_stem).
    """

    stemmer: object
    name: str = "porter"   # fingerprint label for the analyzer contract

    def apply(self, batch: AnalyzedBatch) -> AnalyzedBatch:
        if batch.tok_starts is not None or batch.tok_payloads is not None:
            raise ValueError("StemRepeatFilter composes with neither "
                             "offsets nor payload analysis")
        import pyarrow.compute as _pc

        n_tok = len(batch.tok_doc_idx)
        if n_tok == 0:
            return batch
        dict_enc = _pc.dictionary_encode(batch.tok_terms_pa)
        codes = dict_enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        vocab = np.asarray(
            dict_enc.dictionary.to_numpy(zero_copy_only=False), dtype=object
        )
        stems = np.array([self.stemmer(t) for t in vocab], dtype=object)
        differs = stems != vocab
        tok_diff = differs[codes]
        if not tok_diff.any():
            return batch
        add_terms = stems[codes[tok_diff]]
        new_terms = np.concatenate([
            np.asarray(batch.tok_terms, dtype=object), add_terms,
        ])
        new_doc = np.concatenate([
            batch.tok_doc_idx, batch.tok_doc_idx[tok_diff],
        ])
        new_pos = np.concatenate([
            batch.tok_positions, batch.tok_positions[tok_diff],
        ])
        orig_flag = np.concatenate([
            np.zeros(n_tok, dtype=np.int8),
            np.ones(int(tok_diff.sum()), dtype=np.int8),
        ])
        order = np.lexsort((orig_flag, new_pos, new_doc))
        return AnalyzedBatch(
            n_docs=batch.n_docs,
            doc_lens=batch.doc_lens,   # stems are overlaps (discounted)
            tok_doc_idx=new_doc[order],
            tok_terms_pa=pa.array(new_terms[order], type=pa.string()),
            tok_positions=new_pos[order],
        )

    def fingerprint(self) -> str:
        h = hashlib.md5()
        h.update(repr(("stem_repeat", self.name)).encode())
        return h.hexdigest()
