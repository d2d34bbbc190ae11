"""Analysis chain: tokenize -> lowercase -> stopword filter, vectorized.

Re-expresses the reference's StandardAnalyzer chain
(``core/analysis/standard/StandardAnalyzer.java:84-96`` with the English stop
set of ``analysis/common/.../en/EnglishAnalyzer.java:46-52``):

  - Tokenizer: UAX#29-style word breaks — runs of Unicode letters/digits;
    Han ideographs and Hiragana emitted as single-character tokens
    (StandardTokenizer token types IDEOGRAPHIC/HIRAGANA); tokens longer than
    DEFAULT_MAX_TOKEN_LENGTH=255 are split at 255 chars
    (``StandardTokenizer.java:38-98``).
  - LowerCaseFilter (``core/analysis/LowerCaseFilter.java:36-43``).
  - StopFilter: removing a token adds its position increment to the next
    surviving token (``core/analysis/FilteringTokenFilter.java:49-60``), so a
    surviving token's position equals its 0-based index in the pre-stop
    stream (position starts at -1, FieldInvertState.java:83-92).

Everything runs over Arrow arrays (pyarrow.compute — C kernels), with a
Python fallback only for the rare tokens needing CJK splitting / 255-char
chopping. No per-row Python on the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ENGLISH_STOP_WORDS", "analyze_batch", "AnalyzedBatch", "MAX_TOKEN_LENGTH"]

MAX_TOKEN_LENGTH = 255

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)
_STOP_ARRAY = pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.string())

# RE2 (pyarrow) pattern: split on anything that's not a letter/digit.
_NON_TOKEN_RE2 = r"[^\pL\pN]+"

# Characters that need single-char token treatment (Han + Hiragana) — used
# only to detect rare tokens that take the slow path.
_CJK_SINGLE = (
    "一-鿿㐀-䶿豈-﫿぀-ゟ"
)
_SPECIAL_TOKEN_RE = re.compile(f"[{_CJK_SINGLE}]")
_CJK_SPLIT_RE = re.compile(f"([{_CJK_SINGLE}])")


class AnalyzedBatch:
    """Flat token arrays for one batch of documents.

    doc_lens[i]  = number of surviving (post-stop) tokens of doc i
    tok_doc_idx  = doc index (0-based within batch) per surviving token
    tok_terms    = surviving token strings (numpy object array)
    tok_positions= Lucene position of each surviving token (stop holes kept)
    """

    __slots__ = ("n_docs", "doc_lens", "tok_doc_idx", "tok_terms", "tok_positions")

    def __init__(self, n_docs, doc_lens, tok_doc_idx, tok_terms, tok_positions):
        self.n_docs = n_docs
        self.doc_lens = doc_lens
        self.tok_doc_idx = tok_doc_idx
        self.tok_terms = tok_terms
        self.tok_positions = tok_positions


def _expand_special(
    terms: np.ndarray, doc_idx: np.ndarray, need: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Slow path for rare tokens: CJK single-char split + 255-char chop.

    ``need`` marks the tokens requiring expansion; order is preserved.
    """
    if not need.any():
        return terms, doc_idx
    out_terms: list[str] = []
    out_docs: list[int] = []
    for t, d, n in zip(terms, doc_idx, need):
        if not n:
            out_terms.append(t)
            out_docs.append(d)
            continue
        # split CJK singles out of the run, keep other runs intact
        pieces = [p for p in _CJK_SPLIT_RE.split(t) if p]
        for p in pieces:
            while len(p) > MAX_TOKEN_LENGTH:
                out_terms.append(p[:MAX_TOKEN_LENGTH])
                out_docs.append(d)
                p = p[MAX_TOKEN_LENGTH:]
            out_terms.append(p)
            out_docs.append(d)
    return (
        np.array(out_terms, dtype=object),
        np.array(out_docs, dtype=np.int64),
    )


def analyze_batch(texts: "pd.Series | pa.Array | list[str]") -> AnalyzedBatch:
    """Run the full chain over a batch of texts. Vectorized via Arrow."""
    if isinstance(texts, pd.Series):
        arr = pa.Array.from_pandas(texts.astype("string"))
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(texts, type=pa.string())
    n_docs = len(arr)
    arr = pc.fill_null(arr, "")
    lower = pc.utf8_lower(arr)
    parts = pc.split_pattern_regex(lower, pattern=_NON_TOKEN_RE2)
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "")
    flat = pc.filter(flat, nonempty)
    parent = parent[nonempty.to_numpy(zero_copy_only=False)]

    terms = flat.to_numpy(zero_copy_only=False)  # object array
    # rare-token slow path (CJK singles, >255 chop); cheap check: any token
    # with a char above the Latin ranges or longer than 255
    if len(terms):
        has_big = pc.match_substring_regex(flat, f"[{_CJK_SINGLE}]").to_numpy(zero_copy_only=False)
        too_long = pc.greater(pc.utf8_length(flat), MAX_TOKEN_LENGTH).to_numpy(zero_copy_only=False)
        if has_big.any() or too_long.any():
            terms, parent = _expand_special(terms, parent, has_big | too_long)
            flat = pa.array(terms, type=pa.string())

    # positions: 0-based index within each doc's pre-stop token stream
    counts = np.bincount(parent, minlength=n_docs) if len(parent) else np.zeros(n_docs, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    positions = (np.arange(len(parent), dtype=np.int64) - starts[parent]).astype(np.int32)

    # stop filter: drop tokens, keep position holes
    if len(terms):
        is_stop = pc.is_in(flat, value_set=_STOP_ARRAY).to_numpy(zero_copy_only=False)
        keep = ~is_stop
        terms = terms[keep]
        parent = parent[keep]
        positions = positions[keep]

    doc_lens = (
        np.bincount(parent, minlength=n_docs).astype(np.int32)
        if len(parent)
        else np.zeros(n_docs, dtype=np.int32)
    )
    return AnalyzedBatch(
        n_docs=n_docs,
        doc_lens=doc_lens,
        tok_doc_idx=parent.astype(np.int64),
        tok_terms=terms,
        tok_positions=positions,
    )
