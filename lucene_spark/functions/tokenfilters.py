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
