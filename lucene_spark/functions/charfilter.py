"""MappingCharFilter / NormalizeCharMap.

Re-expresses ``analysis/common/.../charfilter/MappingCharFilter.java`` +
``NormalizeCharMap.java``: a greedy longest-match-at-each-position string
rewriter whose replacements are NOT re-scanned, with BaseCharFilter offset
corrections (a match of length m replaced by r chars adds m-r to the
cumulative diff, positioned after the replacement — the reference's
``addOffCorrectMap`` discipline, identical to ``functions/html.py``).

The reference compiles the map into an FST; here the same longest-match
semantics compile into one alternation regex with branches sorted longest
first (Python's first-match alternation then IS longest-match at each
position), so the scan is a single C-level ``finditer`` pass per document
— no per-character Python.  Corrections are code-point-space, consistent
with the rest of the engine.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from .html import correct_offset  # shared BaseCharFilter correctOffset

__all__ = ["NormalizeCharMap", "mapping_char_filter",
           "mapping_char_filter_offsets", "mapping_char_filter_batch",
           "correct_offset"]


class NormalizeCharMap:
    """NormalizeCharMap.Builder analog: ``{match: replacement}`` rules.

    Mirrors the builder's validation: empty matches rejected, duplicate
    matches rejected (``NormalizeCharMap.Builder.add``).
    """

    def __init__(self, rules):
        pairs = rules.items() if isinstance(rules, dict) else list(rules)
        items = []
        seen = set()
        for k, v in pairs:
            if k == "":
                raise ValueError("cannot match the empty string")
            if k in seen:
                raise ValueError(f"match \"{k}\" was already added")
            seen.add(k)
            items.append((k, v))
        self.rules = tuple(sorted(items))
        # longest-first alternation == greedy longest match per position
        self._re = re.compile("|".join(
            re.escape(k) for k, _ in sorted(items, key=lambda kv: -len(kv[0]))
        )) if items else None
        self._repl = dict(items)

    def fingerprint(self) -> str:
        h = hashlib.md5()
        h.update(repr(self.rules).encode())
        return h.hexdigest()

    # char_filter protocol (operators/indexer.invert_segment)
    def strip(self, text: str) -> str:
        return mapping_char_filter(text, self)

    def strip_offsets(self, text: str):
        return mapping_char_filter_offsets(text, self)

    def strip_batch(self, texts) -> pa.Array:
        return mapping_char_filter_batch(texts, self)


def mapping_char_filter(text: str, cmap: NormalizeCharMap) -> str:
    if cmap._re is None:
        return text
    return cmap._re.sub(lambda m: cmap._repl[m.group()], text)


def mapping_char_filter_offsets(text: str, cmap: NormalizeCharMap):
    """(rewritten, positions, diffs) with BaseCharFilter corrections."""
    if cmap._re is None:
        return text, np.empty(0, np.int64), np.empty(0, np.int64)
    out = []
    out_len = 0
    cum = 0
    pos_l: list[int] = []
    diff_l: list[int] = []
    last = 0
    for m in cmap._re.finditer(text):
        pre = text[last:m.start()]
        if pre:
            out.append(pre)
            out_len += len(pre)
        repl = cmap._repl[m.group()]
        if repl:
            out.append(repl)
            out_len += len(repl)
        cum += (m.end() - m.start()) - len(repl)
        if pos_l and pos_l[-1] == out_len:
            diff_l[-1] = cum
        else:
            pos_l.append(out_len)
            diff_l.append(cum)
        last = m.end()
    out.append(text[last:])
    return "".join(out), np.asarray(pos_l, np.int64), np.asarray(diff_l, np.int64)


def mapping_char_filter_batch(texts, cmap: NormalizeCharMap) -> pa.Array:
    """Batch rewrite; null -> null.  One finditer C pass per doc — docs
    without any trigger substring short-circuit via the regex search."""
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        import pandas as pd

        if isinstance(texts, pd.Series):
            arr = pa.Array.from_pandas(texts.astype("string"))
        else:
            arr = pa.array(list(texts), type=pa.string())
    vals = arr.to_pylist()
    return pa.array(
        [None if v is None else mapping_char_filter(v, cmap) for v in vals],
        type=pa.string(),
    )
