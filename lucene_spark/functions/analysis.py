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

Everything runs over Arrow arrays (pyarrow.compute — C kernels) and the
token strings STAY in Arrow (``AnalyzedBatch.tok_terms_pa``): downstream
consumers dictionary-encode them without ever materializing per-token Python
strings — at millions of tokens per task, PyUnicode allocation churn is what
kills multi-core scaling. Only the rare tokens needing CJK splitting /
255-char chopping take a Python path, and only for the documents containing
them.
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

# Characters needing single-char token treatment (Han + Hiragana).
_CJK_SINGLE = "一-鿿㐀-䶿豈-﫿぀-ゟ"
_CJK_SPLIT_RE = re.compile(f"([{_CJK_SINGLE}])")
_SPECIAL_RE2 = f"[{_CJK_SINGLE}]"


class AnalyzedBatch:
    """Flat token arrays for one batch of documents.

    doc_lens[i]   = number of surviving (post-stop) tokens of doc i
    tok_doc_idx   = doc index (0-based within batch) per surviving token
    tok_terms_pa  = surviving token strings as a pyarrow StringArray
    tok_positions = Lucene position of each surviving token (stop holes kept)
    tok_starts/tok_ends = [start, end) char offsets of each surviving token
        in the ORIGINAL text (OffsetAttribute semantics), or None unless
        analyzed with ``with_offsets=True``

    Within one document, tokens appear in ascending position order; documents
    themselves may be interleaved (edge docs come after fast-path docs).
    ``tok_terms`` materializes numpy object strings on demand (tests/oracle).
    """

    __slots__ = ("n_docs", "doc_lens", "tok_doc_idx", "tok_terms_pa",
                 "tok_positions", "tok_starts", "tok_ends", "tok_payloads",
                 "_np")

    def __init__(self, n_docs, doc_lens, tok_doc_idx, tok_terms_pa, tok_positions,
                 tok_starts=None, tok_ends=None, tok_payloads=None):
        self.n_docs = n_docs
        self.doc_lens = doc_lens
        self.tok_doc_idx = tok_doc_idx
        self.tok_terms_pa = tok_terms_pa
        self.tok_positions = tok_positions
        self.tok_starts = tok_starts
        self.tok_ends = tok_ends
        self.tok_payloads = tok_payloads
        self._np = None

    @property
    def tok_terms(self) -> np.ndarray:
        if self._np is None:
            self._np = np.asarray(self.tok_terms_pa.to_numpy(zero_copy_only=False), dtype=object)
        return self._np


def _expand_doc_tokens(tokens: list[str]) -> list[str]:
    """Slow path for one edge doc: CJK single-char split + 255-char chop."""
    out: list[str] = []
    for t in tokens:
        for p in _CJK_SPLIT_RE.split(t):
            if not p:
                continue
            while len(p) > MAX_TOKEN_LENGTH:
                out.append(p[:MAX_TOKEN_LENGTH])
                p = p[MAX_TOKEN_LENGTH:]
            if p:
                out.append(p)
    return out


def _tokenize_doc_offsets(text: str) -> "tuple[list[str], list[int], list[int]]":
    """One doc, Python path for offsets mode: lowercased tokens plus
    [start, end) char offsets into the ORIGINAL text.

    Mirrors StandardTokenizer's OffsetAttribute (offsets index the source
    text, unchanged by LowerCaseFilter; ``StandardTokenizer.java:38-98``):
    alnum runs (Unicode L*/N* categories = Arrow's ``\\pL\\pN``), CJK
    singles split per character, >255-char runs chopped with per-chunk
    offsets. Only non-[a-z0-9 ] docs and long-token docs take this path.
    """
    import unicodedata

    toks: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    i, n = 0, len(text)
    while i < n:
        if unicodedata.category(text[i])[0] not in "LN":
            i += 1
            continue
        j = i + 1
        while j < n and unicodedata.category(text[j])[0] in "LN":
            j += 1
        pos0 = i
        for part in _CJK_SPLIT_RE.split(text[i:j]):
            if not part:
                continue
            if len(part) == 1 and _CJK_SPLIT_RE.match(part):
                toks.append(part)
                starts.append(pos0)
                ends.append(pos0 + 1)
            else:
                k = 0
                while k < len(part):
                    chunk = part[k : k + MAX_TOKEN_LENGTH]
                    toks.append(chunk.lower())
                    starts.append(pos0 + k)
                    ends.append(pos0 + k + len(chunk))
                    k += len(chunk)
            pos0 += len(part)
        i = j
    return toks, starts, ends


def _analyze_with_offsets(arr: pa.Array, n_docs: int) -> AnalyzedBatch:
    """Offsets-enabled analysis (IndexOptions ..._AND_OFFSETS).

    Clean [a-z0-9 ] docs stay fully vectorized: a space split retaining
    empties makes every part's start offset an exact prefix sum of
    (len + 1) within its doc — no separator ambiguity, works with double
    spaces. Docs with other characters (or >255-char tokens, whose chop
    shifts offsets) take the per-document Python tokenizer.
    """
    doc_bad = (
        pc.match_substring_regex(arr, "[^a-z0-9 ]").to_numpy(zero_copy_only=False)
        if n_docs else np.zeros(0, dtype=bool)
    )
    idx_simple = np.nonzero(~doc_bad)[0]

    flat_parts: list[np.ndarray] = []
    parent_parts: list[np.ndarray] = []
    start_parts: list[np.ndarray] = []
    end_parts: list[np.ndarray] = []
    py_docs: list[int] = []

    if len(idx_simple):
        sub = pc.filter(arr, pa.array(~doc_bad))
        parts = pc.split_pattern(sub, pattern=" ")
        f_all = pc.list_flatten(parts)
        par_all = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(f_all).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(par_all):
            step = lens + 1  # token chars + the single separator
            prev = np.concatenate(([0], np.cumsum(step)[:-1]))
            new_doc = np.empty(len(par_all), dtype=bool)
            new_doc[0] = True
            new_doc[1:] = par_all[1:] != par_all[:-1]
            run_id = np.cumsum(new_doc) - 1
            starts = prev - prev[new_doc][run_id]
            keep = lens > 0
            too_long = lens > MAX_TOKEN_LENGTH
            if too_long.any():
                # chop would shift offsets: send those docs to the Python path
                bad_local = np.unique(par_all[too_long])
                py_docs.extend(int(idx_simple[d]) for d in bad_local)
                is_bad_doc = np.zeros(len(idx_simple), dtype=bool)
                is_bad_doc[bad_local] = True
                keep &= ~is_bad_doc[par_all]
            keep_pa = pa.array(keep)
            f_keep = pc.filter(f_all, keep_pa)
            flat_parts.append(np.asarray(
                f_keep.to_numpy(zero_copy_only=False), dtype=object
            ))
            parent_parts.append(idx_simple[par_all[keep]])
            start_parts.append(starts[keep])
            end_parts.append((starts + lens)[keep])

    py_docs.extend(int(d) for d in np.nonzero(doc_bad)[0])
    if py_docs:
        texts_py = arr.take(pa.array(py_docs, type=pa.int64())).to_pylist()
        for d, text in zip(py_docs, texts_py):
            toks, st, en = _tokenize_doc_offsets(text or "")
            if not toks:
                continue
            flat_parts.append(np.asarray(toks, dtype=object))
            parent_parts.append(np.full(len(toks), d, dtype=np.int64))
            start_parts.append(np.asarray(st, dtype=np.int64))
            end_parts.append(np.asarray(en, dtype=np.int64))

    if flat_parts:
        flat_np = np.concatenate(flat_parts)
        parent = np.concatenate(parent_parts).astype(np.int64)
        tok_starts = np.concatenate(start_parts).astype(np.int32)
        tok_ends = np.concatenate(end_parts).astype(np.int32)
    else:
        flat_np = np.empty(0, dtype=object)
        parent = np.empty(0, dtype=np.int64)
        tok_starts = np.empty(0, dtype=np.int32)
        tok_ends = np.empty(0, dtype=np.int32)

    positions = _positions_within_docs(parent, n_docs)
    flat = pa.array(flat_np, type=pa.string())
    if len(flat):
        is_stop = pc.is_in(flat, value_set=_STOP_ARRAY)
        keep_np = ~is_stop.to_numpy(zero_copy_only=False)
        flat = pc.filter(flat, pa.array(keep_np))
        parent = parent[keep_np]
        positions = positions[keep_np]
        tok_starts = tok_starts[keep_np]
        tok_ends = tok_ends[keep_np]
    doc_lens = (
        np.bincount(parent, minlength=n_docs).astype(np.int32)
        if len(parent)
        else np.zeros(n_docs, dtype=np.int32)
    )
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return AnalyzedBatch(
        n_docs=n_docs,
        doc_lens=doc_lens,
        tok_doc_idx=parent,
        tok_terms_pa=flat,
        tok_positions=positions,
        tok_starts=tok_starts,
        tok_ends=tok_ends,
    )


PAYLOAD_DELIM = "|"
# RE2: split the token at its LAST delimiter (greedy .*), payload = trailing
# digit run (1-9 digits keeps the int64 cast safe; a longer digit tail is
# not treated as a payload, same spirit as DelimitedPayloadTokenFilter
# leaving undecodable suffixes in the term)
_PAYLOAD_RE2 = r"^(?s)(?P<t>.*)\|(?P<p>[0-9]{1,9})$"


def _analyze_payload_delim(arr: pa.Array, n_docs: int) -> AnalyzedBatch:
    """Payload analysis chain: WhitespaceTokenizer -> DelimitedPayloadTokenFilter
    -> LowerCaseFilter (no stop filter).

    Re-expresses the reference's payload field chain
    (``analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:30-77``):
    each whitespace token of the form ``term|N`` carries integer payload N
    (an IntegerEncoder analog of the float PayloadEncoder); tokens without a
    trailing ``|digits`` get no payload (stored as 0). The delimiter is
    looked up from the END of the token, like the filter's backwards scan.

    Fully vectorized: one split, one regex-extract, one cast — token strings
    stay in Arrow throughout.
    """
    parts = pc.split_pattern(arr, pattern=" ")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    ne = pc.not_equal(flat, "")
    ne_np = ne.to_numpy(zero_copy_only=False)
    flat = pc.filter(flat, ne)
    parent = parent[ne_np]
    if len(flat):
        ex = pc.extract_regex(flat, _PAYLOAD_RE2)
        has_pay = pc.is_valid(ex)
        terms = pc.if_else(has_pay, pc.struct_field(ex, "t"), flat)
        pays = pc.if_else(
            has_pay,
            pc.cast(pc.struct_field(ex, "p"), pa.int64()),
            pa.scalar(0, type=pa.int64()),
        )
        flat = pc.utf8_lower(terms)
        payloads = pays.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        payloads = np.empty(0, dtype=np.int64)
    positions = _positions_within_docs(parent, n_docs)
    doc_lens = (
        np.bincount(parent, minlength=n_docs).astype(np.int32)
        if len(parent)
        else np.zeros(n_docs, dtype=np.int32)
    )
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return AnalyzedBatch(
        n_docs=n_docs,
        doc_lens=doc_lens,
        tok_doc_idx=parent,
        tok_terms_pa=flat,
        tok_positions=positions,
        tok_payloads=payloads,
    )


def _positions_within_docs(parent: np.ndarray, n_docs: int) -> np.ndarray:
    """0-based index of each token within its doc (tokens doc-contiguous)."""
    if not len(parent):
        return np.empty(0, dtype=np.int32)
    counts = np.bincount(parent, minlength=n_docs)
    # tokens are contiguous per doc in stream order; recover each run's start
    new_doc = np.empty(len(parent), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = parent[1:] != parent[:-1]
    run_starts = np.nonzero(new_doc)[0]
    run_id = np.cumsum(new_doc) - 1
    return (np.arange(len(parent), dtype=np.int64) - run_starts[run_id]).astype(np.int32)


def analyze_batch(
    texts: "pd.Series | pa.Array | list[str]", with_offsets: bool = False,
    payload_delim: bool = False,
) -> AnalyzedBatch:
    """Run the full chain over a batch of texts. Vectorized via Arrow.

    ``with_offsets=True`` additionally yields per-token [start, end) char
    offsets into the original text (OffsetAttribute) on a dedicated path;
    the default path stays offset-free and maximally vectorized.

    ``payload_delim=True`` switches to the payload chain (whitespace +
    delimited-payload + lowercase, no stop filter) — see
    ``_analyze_payload_delim``. Mutually exclusive with ``with_offsets``.
    """
    if isinstance(texts, pd.Series):
        arr = pa.Array.from_pandas(texts.astype("string"))
    elif isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    else:
        arr = pa.array(texts, type=pa.string())
    n_docs = len(arr)
    arr = pc.fill_null(arr, "")
    if payload_delim:
        if with_offsets:
            raise ValueError("payload_delim and with_offsets are exclusive")
        return _analyze_payload_delim(arr, n_docs)
    if with_offsets:
        return _analyze_with_offsets(arr, n_docs)

    def _tokenize(sub: pa.Array, simple: bool):
        """(flat tokens, local parent idx, needs_cjk_scan) for a doc subset.

        ``simple`` docs are pure [a-z0-9 ]: lowercase is the identity, the
        UAX#29 split degenerates to a plain space split (empties filtered
        either way), and the CJK token scan is provably empty — ~6x faster
        than the regex machinery. Mixed batches split per DOC, so one
        emoji page doesn't tax a million clean ones.
        """
        if simple:
            parts = pc.split_pattern(sub, pattern=" ")
        else:
            parts = pc.split_pattern_regex(pc.utf8_lower(sub), pattern=_NON_TOKEN_RE2)
        f = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        ne = pc.not_equal(f, "")
        return pc.filter(f, ne), par[ne.to_numpy(zero_copy_only=False)]

    doc_bad = (
        pc.match_substring_regex(arr, "[^a-z0-9 ]").to_numpy(zero_copy_only=False)
        if n_docs else np.zeros(0, dtype=bool)
    )
    n_bad = int(doc_bad.sum())
    if n_bad == 0:
        flat, parent = _tokenize(arr, simple=True)
        all_simple = True
    elif n_bad == n_docs:
        flat, parent = _tokenize(arr, simple=False)
        all_simple = False
    else:
        # per-doc split: each doc's tokens stay contiguous; docs interleave
        # (simple subset first), which every consumer tolerates by contract
        idx_s = np.nonzero(~doc_bad)[0]
        idx_g = np.nonzero(doc_bad)[0]
        f_s, p_s = _tokenize(pc.filter(arr, pa.array(~doc_bad)), simple=True)
        f_g, p_g = _tokenize(pc.filter(arr, pa.array(doc_bad)), simple=False)
        flat = pa.concat_arrays([
            f_s.combine_chunks() if isinstance(f_s, pa.ChunkedArray) else f_s,
            f_g.combine_chunks() if isinstance(f_g, pa.ChunkedArray) else f_g,
        ])
        parent = np.concatenate([idx_s[p_s], idx_g[p_g]])
        all_simple = False
        n_simple_toks = len(f_s)

    # rare-token slow path, per DOCUMENT: docs containing CJK singles or
    # >255-char tokens are re-expanded in Python; all other docs stay Arrow
    if len(flat):
        too_long = pc.greater(pc.utf8_length(flat), MAX_TOKEN_LENGTH)
        if all_simple:
            special = too_long.to_numpy(zero_copy_only=False)
        elif n_bad == n_docs:
            special = pc.or_(
                pc.match_substring_regex(flat, _SPECIAL_RE2), too_long
            ).to_numpy(zero_copy_only=False)
        else:
            # CJK can only live in the general (bad-doc) token tail
            cjk_g = pc.match_substring_regex(
                flat.slice(n_simple_toks), _SPECIAL_RE2
            ).to_numpy(zero_copy_only=False)
            special = too_long.to_numpy(zero_copy_only=False)
            special[n_simple_toks:] |= cjk_g
        if special.any():
            edge_docs = np.unique(parent[special])
            is_edge_doc = np.zeros(n_docs, dtype=bool)
            is_edge_doc[edge_docs] = True
            tok_is_edge = is_edge_doc[parent]
            fast_flat = pc.filter(flat, pa.array(~tok_is_edge))
            fast_parent = parent[~tok_is_edge]
            # python expansion only for edge docs' tokens
            edge_tokens = pc.filter(flat, pa.array(tok_is_edge)).to_pylist()
            edge_parent_in = parent[tok_is_edge]
            # iterate edge docs in APPEARANCE order (doc ids are contiguous
            # runs in the stream but not globally sorted once the per-doc
            # fast/general split interleaves subsets)
            run_first = np.concatenate(
                ([True], edge_parent_in[1:] != edge_parent_in[:-1])
            ) if len(edge_parent_in) else np.zeros(0, dtype=bool)
            edge_docs_in_order = edge_parent_in[run_first]
            exp_terms: list[str] = []
            exp_parent: list[int] = []
            start = 0
            for d in edge_docs_in_order:
                cnt = int((edge_parent_in == d).sum())
                toks = _expand_doc_tokens(edge_tokens[start : start + cnt])
                exp_terms.extend(toks)
                exp_parent.extend([int(d)] * len(toks))
                start += cnt
            flat = pa.concat_arrays([fast_flat.combine_chunks() if isinstance(fast_flat, pa.ChunkedArray) else fast_flat, pa.array(exp_terms, type=pa.string())])
            parent = np.concatenate([fast_parent, np.asarray(exp_parent, dtype=np.int64)])

    positions = _positions_within_docs(parent.astype(np.int64), n_docs)

    # stop filter: drop tokens, keep position holes
    if len(flat):
        is_stop = pc.is_in(flat, value_set=_STOP_ARRAY)
        keep_np = ~is_stop.to_numpy(zero_copy_only=False)
        flat = pc.filter(flat, pa.array(keep_np))
        parent = parent[keep_np]
        positions = positions[keep_np]

    doc_lens = (
        np.bincount(parent, minlength=n_docs).astype(np.int32)
        if len(parent)
        else np.zeros(n_docs, dtype=np.int32)
    )
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return AnalyzedBatch(
        n_docs=n_docs,
        doc_lens=doc_lens,
        tok_doc_idx=parent.astype(np.int64),
        tok_terms_pa=flat,
        tok_positions=positions,
    )


FILLER_TOKEN = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN


def shingle_batch(batch: AnalyzedBatch, size: int = 2):
    """ShingleFilter (analysis/common/.../shingle/ShingleFilter.java) —
    fixed-size word n-grams over the analyzed token stream, with the
    reference's hole semantics:

    - a position increment of ``g > 1`` inserts ``min(g - 1, size - 1)``
      FILLER tokens ("_") before the carrying token
      (``getNextToken``, java:356-360 — long holes truncate, because a
      shingle must contain at least one real token);
    - leading holes insert fillers too (the first token carries its
      increment);
    - trailing holes insert nothing (no later token carries them);
    - windows that are ALL fillers are skipped (java:291);
    - tokens join with a single space (TOKEN_SEPARATOR, java:41).

    Returns (doc_idx, shingles): int64 + object numpy arrays, one row
    per emitted shingle, in stream order. Vectorized: the synthetic
    filler-expanded stream is built with repeat/cumsum index math, and
    the window slide is ``size`` strided comparisons — no per-token
    Python loop.
    """
    if size < 2:
        raise ValueError("shingle size must be >= 2")
    di = np.asarray(batch.tok_doc_idx, dtype=np.int64)
    pos = np.asarray(batch.tok_positions, dtype=np.int64)
    terms = batch.tok_terms
    if len(di) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=object))
    first = np.empty(len(di), dtype=bool)
    first[0] = True
    first[1:] = di[1:] != di[:-1]
    prev_pos = np.empty_like(pos)
    prev_pos[0] = -1
    prev_pos[1:] = pos[:-1]
    prev_pos[first] = -1
    gap = pos - prev_pos  # == the token's position increment
    n_fill = np.clip(gap - 1, 0, size - 1)
    # synthetic stream: n_fill fillers then the token itself
    width = n_fill + 1
    total = int(width.sum())
    stream_terms = np.empty(total, dtype=object)
    stream_doc = np.repeat(di, width)
    stream_is_tok = np.zeros(total, dtype=bool)
    tok_slots = np.cumsum(width) - 1  # each token lands after its fillers
    stream_is_tok[tok_slots] = True
    stream_terms[:] = FILLER_TOKEN
    stream_terms[tok_slots] = terms
    # windows of `size` consecutive stream slots, same doc, not all filler
    n = total - size + 1
    if n <= 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=object))
    ok = stream_doc[:n] == stream_doc[size - 1:]
    any_tok = np.zeros(n, dtype=bool)
    for j in range(size):
        any_tok |= stream_is_tok[j:j + n]
    ok &= any_tok
    idx = np.nonzero(ok)[0]
    if len(idx) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=object))
    parts = [stream_terms[idx + j] for j in range(size)]
    out = parts[0].copy()
    for j in range(1, size):
        out = np.char.add(np.char.add(out.astype(str), " "),
                          parts[j].astype(str))
    return (stream_doc[idx], np.asarray(out, dtype=object))
