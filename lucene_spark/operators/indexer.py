"""Segment-based inverted index build.

Spark-first shape of Lucene's indexing dataflow (SURVEY.md §3a):

  - A *segment* is the unit of checkpoint/commit: one ``applyInPandas``
    group builds one segment (Spark tasks are the DocumentsWriterPerThreads;
    ``core/index/DocumentsWriterPerThreadPool.java:85-125``).
  - Per segment we emit, as one union-schema DataFrame written
    ``partitionBy("row_type")``:
      * ``post`` rows — one per (term, 128-doc block): PFOR-compressed doc
        gaps / freqs / norms / position deltas + the block's competitive
        (freq, norm) impact frontier (mirrors ``Lucene90PostingsWriter`` +
        ``CompetitiveImpactAccumulator``; norms ride along per block so
        query-time scoring needs no join).
      * ``term`` rows — per-segment term stats (doc_freq, total_term_freq),
        the term-dictionary analog (blocktree+FST replaced by a sorted
        Parquet table with min/max stats).
      * ``doc`` rows — (gid, key, doc_len, norm_b), the docs/norms tables.
  - A JSONL *manifest* (``core/index/SegmentInfos.java`` analog) commits one
    line per build batch with per-segment lineage + metrics; a killed build
    resumes from the last committed line.

Global docIDs (``gid``) are dense int64s. When the corpus has no natural id,
segment assignment is ``xxhash64(key) % n_segments`` and gids are
``segment_base + rank_within_segment(key)`` — deterministic, and the
in-segment sort by key mirrors Lucene's index-time docID assignment
(FIXTURES.md pins doc order = url order).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.analysis import analyze_batch
from ..functions.bm25 import BM25Scorer  # noqa: F401 (re-export convenience)
from ..functions.impacts import competitive_impacts_grouped
from ..functions.pfor import BLOCK_SIZE, batch_encode_streams
from ..functions.smallfloat import int_to_byte4_np
from ..plans.fields import DEFAULT_FIELD, FIELD_SEP

STAGING_SCHEMA = T.StructType(
    [
        T.StructField("row_type", T.StringType()),
        T.StructField("seg", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("block_ord", T.IntegerType()),
        T.StructField("doc_count", T.IntegerType()),
        T.StructField("first_gid", T.LongType()),
        T.StructField("last_gid", T.LongType()),
        T.StructField("gids", T.BinaryType()),
        T.StructField("freqs", T.BinaryType()),
        T.StructField("norms", T.BinaryType()),
        T.StructField("positions", T.BinaryType()),
        # offsets mode (IndexOptions ..._AND_OFFSETS): per-token start-offset
        # delta stream + raw token-length stream, position-aligned; null
        # when the index stores no offsets
        T.StructField("off_starts", T.BinaryType()),
        T.StructField("off_lens", T.BinaryType()),
        # payloads mode: per-occurrence integer payload stream, position-
        # aligned (PayloadAttribute / .pay file analog); null when the
        # index stores no payloads
        T.StructField("payloads", T.BinaryType()),
        T.StructField("imp_freqs", T.ArrayType(T.LongType())),
        T.StructField("imp_norms", T.ArrayType(T.IntegerType())),
        T.StructField("gid", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("doc_len", T.IntegerType()),
        T.StructField("norm_b", T.IntegerType()),
        T.StructField("doc_freq", T.LongType()),
        T.StructField("total_term_freq", T.LongType()),
        # segstat rows: one per segment, so manifest metrics + collection
        # stats need no extra Spark jobs (driver reads a handful of rows)
        T.StructField("s_n_docs", T.LongType()),
        T.StructField("s_doc_count", T.LongType()),
        T.StructField("s_sum_dl", T.LongType()),
        T.StructField("s_max_gid", T.LongType()),
        T.StructField("s_n_terms", T.LongType()),
        T.StructField("s_n_postings", T.LongType()),
        # doc rows of a sort_by index: the doc's index-sort key
        # (IndexWriterConfig.setIndexSort analog); null elsewhere
        T.StructField("sort_val", T.LongType()),
    ]
)

# Per-column Arrow types for the direct parquet writer — must stay
# read-compatible with what Spark's own writer produces for STAGING_SCHEMA
# (int32 for IntegerType etc.), since both layouts coexist under
# ``segments/batch=*``.
_ARROW_TYPES: "dict[str, object]" = {}


def _arrow_types():
    if not _ARROW_TYPES:
        import pyarrow as pa

        _ARROW_TYPES.update(
            {
                "seg": pa.int64(),
                "term": pa.string(),
                "block_ord": pa.int32(),
                "doc_count": pa.int32(),
                "first_gid": pa.int64(),
                "last_gid": pa.int64(),
                "gids": pa.binary(),
                "freqs": pa.binary(),
                "norms": pa.binary(),
                "positions": pa.binary(),
                "off_starts": pa.binary(),
                "off_lens": pa.binary(),
                "payloads": pa.binary(),
                "imp_freqs": pa.list_(pa.int64()),
                "imp_norms": pa.list_(pa.int32()),
                "gid": pa.int64(),
                "key": pa.string(),
                "doc_len": pa.int32(),
                "norm_b": pa.int32(),
                "doc_freq": pa.int64(),
                "total_term_freq": pa.int64(),
                "s_n_docs": pa.int64(),
                "s_doc_count": pa.int64(),
                "s_sum_dl": pa.int64(),
                "s_max_gid": pa.int64(),
                "s_n_terms": pa.int64(),
                "s_n_postings": pa.int64(),
                "sort_val": pa.int64(),
            }
        )
    return _ARROW_TYPES


def write_segment_parquet(frames: "list[pd.DataFrame]", out_path: str, seg: int) -> int:
    """Write one segment's staging frames straight to parquet from the
    Python worker (the direct-write path): one file per row_type under
    ``out_path/row_type=X/``, each with only that row_type's columns.

    Skips the Arrow-IPC hop back into the JVM and Spark's union-schema
    write. NOTE: measured slower than the Spark writer in local mode (see
    ``build_index(direct_write=...)``) because the default path overlaps
    Python compute with JVM parquet encoding; kept as an opt-in for
    worker-owned-file deployments.
    Atomicity: each file lands via write-to-temp + rename with a
    deterministic final name per (seg, row_type), so task retries and
    speculative attempts are idempotent (last writer wins with identical
    bytes); batch visibility is gated by the manifest commit exactly as
    before. Returns the total row count written."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    types = _arrow_types()
    by_type: "dict[str, list[pd.DataFrame]]" = {}
    for f in frames:
        if not len(f):
            continue
        rt = str(f["row_type"].iloc[0])
        by_type.setdefault(rt, []).append(f)
    total = 0
    for rt, fs in by_type.items():
        tabs = []
        for f in fs:
            cols = [c for c in f.columns if c != "row_type"]
            arrays = []
            for c in cols:
                s = f[c]
                if str(s.dtype) == "string":
                    arr = pa.Array.from_pandas(s, type=types[c])
                elif s.dtype == object:
                    arr = pa.array(list(s), type=types[c])
                else:
                    arr = pa.array(s.to_numpy()).cast(types[c])
                arrays.append(arr)
            tabs.append(pa.table(dict(zip(cols, arrays))))
        tab = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
        d = os.path.join(out_path, f"row_type={rt}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".seg-{seg:05d}-{uuid.uuid4().hex}.tmp")
        # dictionary-encode / collect stats only on the small scalar
        # columns: hashing multi-KB posting payloads into dictionaries and
        # min/max-ing them is pure overhead (the JVM writer's fallback
        # heuristics hide this; here we opt out explicitly)
        small = [
            c for c in tab.column_names
            if not (
                pa.types.is_binary(tab.schema.field(c).type)
                or pa.types.is_list(tab.schema.field(c).type)
            )
        ]
        pq.write_table(
            tab, tmp, compression="snappy",
            use_dictionary=small, write_statistics=small,
        )
        os.replace(tmp, os.path.join(d, f"part-seg{seg:05d}.parquet"))
        total += len(tab)
    return total


def _resolve_char_filters(char_filter):
    """Normalize the ``char_filter`` argument into a chain of
    (single-doc-with-offsets unavailable? no —) triples
    ``(fingerprint, strip_offsets_fn, strip_batch_fn)``.

    Accepted: ``"html"`` (HTMLStripCharFilter, ``functions/html.py``), a
    ``functions/charfilter.NormalizeCharMap`` (MappingCharFilter), or a
    list/tuple chaining them in application order (the reference nests
    CharFilters the same way — initReader wraps readers outermost-last).
    """
    from ..functions.charfilter import NormalizeCharMap
    from ..functions.html import html_strip_batch, html_strip_offsets

    items = (
        list(char_filter) if isinstance(char_filter, (list, tuple))
        else [char_filter]
    )
    out = []
    for it in items:
        if it == "html":
            out.append(("html", html_strip_offsets, html_strip_batch))
        elif isinstance(it, NormalizeCharMap):
            out.append((f"map:{it.fingerprint()}", it.strip_offsets,
                        it.strip_batch))
        else:
            raise ValueError(f"unknown char_filter: {it!r}")
    return out


def char_filter_fingerprint(char_filter) -> "str | None":
    """Stable id of a char_filter chain for stats.json / append guard."""
    if char_filter is None:
        return None
    return "+".join(fp for fp, _o, _b in _resolve_char_filters(char_filter))


def invert_segment(
    seg_id: int,
    gids: np.ndarray,
    keys: np.ndarray,
    texts: pd.Series,
    with_positions: bool = True,
    field: str = DEFAULT_FIELD,
    as_frames: bool = False,
    sort_vals: "np.ndarray | None" = None,
    with_offsets: bool = False,
    with_payloads: bool = False,
    token_filter=None,
    char_filter: "str | None" = None,
    synonyms=None,
    stream_filter=None,
) -> "pd.DataFrame | list[pd.DataFrame]":
    """Analyze + invert one segment's docs into union-schema staging rows.

    ``synonyms``: optional ``functions/synonyms.SynonymMap`` — index-time
    synonym expansion (SynonymGraphFilter + flatten semantics: outputs
    stacked at the match's start position, norms overlap-discounted).
    Applied BEFORE ``token_filter`` (synonyms on surface forms, stemming
    over the union — the usual EnglishAnalyzer chain order).

    ``char_filter="html"`` runs HTMLStripCharFilter (``functions/html.py``)
    ahead of the tokenizer, the initReader position of a CharFilter in the
    reference's analyzer chain (``core/analysis/Analyzer.java`` initReader;
    ``HTMLStripCharFilter.jflex``). With ``with_offsets`` the per-token
    offsets are mapped through the filter's BaseCharFilter correction map,
    so stored offsets point into the ORIGINAL html — what the reference's
    offset-based highlighting does over char-filtered fields.

    ``token_filter``: optional per-term mapping (e.g. the Porter stem of
    ``functions/stem.py``) applied at the VOCABULARY level — the batch is
    dictionary-encoded anyway, so each distinct surface form maps once
    and colliding stems re-unify before term-ordering (the indexing-chain
    position of PorterStemFilter in EnglishAnalyzer.createComponents).
    Queries against such an index must map their terms with the same
    filter (``plans/query.py map_terms``), the analyzer contract.

    ``as_frames=True`` returns the per-row_type frames BEFORE union-schema
    padding (for the direct parquet writer, which stores each row_type
    with its own columns and skips the null-padded union entirely).

    Pure pandas/numpy — runs inside applyInPandas but unit-testable without
    Spark. ``gids`` must be sorted ascending (docID order within segment).

    ``field``: which index field this text belongs to (FieldInfos analog).
    Non-default fields store QUALIFIED term keys (``plans/fields.py``) and
    emit only postings + term-stat + fieldstat rows — the doc/segstat rows
    belong to the default field's pass. Norms are per (doc, field) by
    construction: each field's pass encodes its own doc lengths into its
    blocks (``core/index/IndexingChain.java:1103-1117``).
    """
    gids = np.asarray(gids, dtype=np.int64)
    assert len(gids) == 0 or (np.diff(gids) > 0).all(), "gids must be strictly increasing"
    is_default = field == DEFAULT_FIELD
    prefix = "" if is_default else f"{field}{FIELD_SEP}"
    if with_offsets and not with_positions:
        raise ValueError("with_offsets requires with_positions")
    if with_payloads and not with_positions:
        raise ValueError("with_payloads requires with_positions")
    if char_filter is not None:
        filters = _resolve_char_filters(char_filter)
        if with_offsets:
            # per-doc strips with BaseCharFilter correction maps (one per
            # filter, composed right-to-left on the token offsets below)
            vals = (
                texts.astype("string").fillna("").tolist()
                if isinstance(texts, pd.Series)
                else ["" if v is None else str(v) for v in list(texts)]
            )
            corr_maps = []
            stripped = []
            for v in vals:
                maps = []
                for _, strip_off, _b in filters:
                    v, cpos, cdiff = strip_off(v)
                    maps.append((cpos, cdiff))
                stripped.append(v)
                corr_maps.append(maps)
            texts = pd.Series(stripped, dtype="string")
        else:
            for _, _o, strip_batch in filters:
                texts = strip_batch(texts)
    batch = analyze_batch(
        texts, with_offsets=with_offsets, payload_delim=with_payloads
    )
    if char_filter is not None and with_offsets and len(batch.tok_doc_idx):
        # correctOffset per token: corrected = off + diff of the last map
        # entry at position <= off (monotone, so delta encoding stays
        # valid); with a filter chain, maps compose innermost-first
        # (reversed application order), the nested-CharFilter semantics
        st = batch.tok_starts.astype(np.int64)
        en = batch.tok_ends.astype(np.int64)
        for d in np.unique(batch.tok_doc_idx):
            sel = batch.tok_doc_idx == d
            for cpos, cdiff in reversed(corr_maps[int(d)]):
                if not len(cpos):
                    continue
                ix = np.searchsorted(cpos, st[sel], side="right") - 1
                st[sel] += np.where(ix >= 0, cdiff[np.maximum(ix, 0)], 0)
                ix = np.searchsorted(cpos, en[sel], side="right") - 1
                en[sel] += np.where(ix >= 0, cdiff[np.maximum(ix, 0)], 0)
        batch.tok_starts = st
        batch.tok_ends = en
    if synonyms is not None:
        from ..functions.synonyms import expand_synonyms

        batch = expand_synonyms(batch, synonyms)
    if stream_filter is not None:
        # stream-level token filter (e.g. functions/ngram.NGramFilter):
        # any object with .apply(AnalyzedBatch) -> AnalyzedBatch
        batch = stream_filter.apply(batch)
    doc_lens = batch.doc_lens.astype(np.int64)
    norms_by_doc = int_to_byte4_np(doc_lens)

    # ---- token -> (term, gid) pair aggregation, fully vectorized.
    # Dictionary-encode in Arrow: per-token work stays on int codes; term
    # strings materialize once per unique term (PyUnicode churn is the
    # multi-core scaling killer at millions of tokens per task).
    import pyarrow.compute as pc

    dict_enc = pc.dictionary_encode(batch.tok_terms_pa)
    codes = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_vals = np.asarray(dict_enc.dictionary.to_numpy(zero_copy_only=False), dtype=object)
    if token_filter is not None:
        # stem each DISTINCT surface form once, re-unify colliding stems
        mapped = np.array([token_filter(t) for t in dict_vals], dtype=object)
        dict_vals, inv = np.unique(mapped, return_inverse=True)
        codes = inv[codes]
    sort_perm = np.argsort(dict_vals)  # code-point order == UTF-8 byte order
    rank = np.empty(len(dict_vals), dtype=np.int64)
    rank[sort_perm] = np.arange(len(dict_vals))
    tc = rank[codes]
    uniq_terms = dict_vals[sort_perm]
    if prefix:
        # constant prefix preserves the sorted term order within the field
        uniq_terms = np.array([prefix + t for t in uniq_terms], dtype=object)
    tok_gid = gids[batch.tok_doc_idx]
    tok_doc = batch.tok_doc_idx
    # lexsort by (term, gid); stable, so within a (term, doc) pair tokens
    # keep ascending position order
    order = np.lexsort((tok_gid, tc))
    tc_s = tc[order]
    gid_s = tok_gid[order]
    doc_s = tok_doc[order]
    pos_s = batch.tok_positions[order].astype(np.int64)

    n_tok = len(tc_s)
    n_pairs_total = 0
    n_terms_total = 0
    rows: list[pd.DataFrame] = []
    if n_tok:
        new_pair = np.empty(n_tok, dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (tc_s[1:] != tc_s[:-1]) | (gid_s[1:] != gid_s[:-1])
        pair_start = np.nonzero(new_pair)[0]
        n_pairs = len(pair_start)
        pair_id = np.cumsum(new_pair) - 1
        freq_p = np.bincount(pair_id, minlength=n_pairs).astype(np.int64)
        tc_p = tc_s[pair_start]
        gid_p = gid_s[pair_start]
        norm_p = norms_by_doc[doc_s[pair_start]].astype(np.int64)

        # position deltas (first = absolute position, then gaps)
        pos_delta = pos_s.copy()
        pos_delta[1:] -= pos_s[:-1]
        pos_delta[pair_start] = pos_s[pair_start]

        # ---- per-term stats
        new_term = np.empty(n_pairs, dtype=bool)
        new_term[0] = True
        new_term[1:] = tc_p[1:] != tc_p[:-1]
        term_start = np.nonzero(new_term)[0]
        term_id_of_pair = np.cumsum(new_term) - 1
        doc_freq_t = np.bincount(term_id_of_pair).astype(np.int64)
        ttf_t = np.bincount(term_id_of_pair, weights=freq_p).astype(np.int64)
        term_codes_present = tc_p[term_start]
        n_pairs_total = n_pairs
        n_terms_total = len(term_start)

        # ---- block assignment: 128 docs per (term) block
        idx_in_term = np.arange(n_pairs) - term_start[term_id_of_pair]
        block_ord_p = (idx_in_term // BLOCK_SIZE).astype(np.int64)
        new_block = new_term | (block_ord_p != np.concatenate(([0], block_ord_p[:-1])))
        new_block[0] = True
        block_start = np.nonzero(new_block)[0]
        n_blocks = len(block_start)
        block_id_of_pair = np.cumsum(new_block) - 1
        docs_per_block = np.bincount(block_id_of_pair, minlength=n_blocks).astype(np.int64)
        block_term = tc_p[block_start]
        block_ord = block_ord_p[block_start]
        first_gid_b = gid_p[block_start]
        block_end = np.concatenate((block_start[1:], [n_pairs])) - 1
        last_gid_b = gid_p[block_end]

        # ---- payloads (batch-encoded streams)
        # doc gaps: within-block diffs (first doc stored in first_gid column)
        gaps_all = np.empty(n_pairs, dtype=np.int64)
        gaps_all[0] = 0
        gaps_all[1:] = gid_p[1:] - gid_p[:-1]
        keep = ~new_block
        gids_payload = batch_encode_streams(gaps_all[keep].astype(np.uint64), docs_per_block - 1)
        freqs_payload = batch_encode_streams(freq_p.astype(np.uint64), docs_per_block)
        norms_payload = batch_encode_streams(norm_p.astype(np.uint64), docs_per_block)
        if with_positions:
            # positions are token-aligned: block of a token = block of its pair
            pos_rl = np.bincount(block_id_of_pair[pair_id], minlength=n_blocks).astype(np.int64)
            positions_payload = batch_encode_streams(pos_delta.astype(np.uint64), pos_rl)
        else:
            positions_payload = [None] * n_blocks
        off_starts_payload = off_lens_payload = None
        if with_offsets:
            # start offsets ascend with positions within a (term, doc) pair,
            # so the same delta-with-per-pair-absolute-reset encoding applies
            # (Lucene90PostingsWriter startOffset deltas + length stream)
            st_s = batch.tok_starts[order].astype(np.int64)
            en_s = batch.tok_ends[order].astype(np.int64)
            st_delta = st_s.copy()
            st_delta[1:] -= st_s[:-1]
            st_delta[pair_start] = st_s[pair_start]
            off_starts_payload = batch_encode_streams(
                st_delta.astype(np.uint64), pos_rl
            )
            off_lens_payload = batch_encode_streams(
                (en_s - st_s).astype(np.uint64), pos_rl
            )
        payloads_payload = None
        if with_payloads:
            # raw per-occurrence values, position-aligned — no delta (values
            # are arbitrary, not monotone; PFOR handles small ints directly)
            payloads_payload = batch_encode_streams(
                batch.tok_payloads[order].astype(np.uint64), pos_rl
            )

        # ---- impacts per block (vectorized across all blocks)
        imp_freqs, imp_norms = competitive_impacts_grouped(
            block_id_of_pair, freq_p, norm_p, n_blocks
        )

        post_cols = {
            "row_type": "post",
            "seg": np.int64(seg_id),
            "term": pd.Series(uniq_terms[block_term], dtype="string"),
            "block_ord": block_ord.astype(np.int32),
            "doc_count": docs_per_block.astype(np.int32),
            "first_gid": first_gid_b,
            "last_gid": last_gid_b,
            "gids": gids_payload,
            "freqs": freqs_payload,
            "norms": norms_payload,
            "positions": positions_payload,
            "imp_freqs": imp_freqs,
            "imp_norms": imp_norms,
        }
        if with_offsets:
            post_cols["off_starts"] = off_starts_payload
            post_cols["off_lens"] = off_lens_payload
        if with_payloads:
            post_cols["payloads"] = payloads_payload
        post = pd.DataFrame(post_cols)
        term_rows = pd.DataFrame(
            {
                "row_type": "term",
                "seg": np.int64(seg_id),
                "term": pd.Series(uniq_terms[term_codes_present], dtype="string"),
                "doc_freq": doc_freq_t,
                "total_term_freq": ttf_t,
            }
        )
        rows.extend([post, term_rows])

    if is_default:
        doc_cols = {
            "row_type": "doc",
            "seg": np.int64(seg_id),
            "gid": gids,
            "key": pd.Series(np.asarray(keys, dtype=object), dtype="string"),
            "doc_len": doc_lens.astype(np.int32),
            "norm_b": norms_by_doc.astype(np.int32),
        }
        if sort_vals is not None:
            # index-sort key per doc: gids were assigned in sort order, so
            # gid order within the segment IS sort order (IndexSorter)
            doc_cols["sort_val"] = np.asarray(sort_vals, dtype=np.int64)
        doc_rows = pd.DataFrame(doc_cols)
        rows.append(doc_rows)
        seg_stat = pd.DataFrame(
            {
                "row_type": ["segstat"],
                "seg": [np.int64(seg_id)],
                "s_n_docs": [np.int64(len(gids))],
                "s_doc_count": [np.int64(int((doc_lens > 0).sum()))],
                "s_sum_dl": [np.int64(int(doc_lens.sum()))],
                "s_max_gid": [np.int64(int(gids.max())) if len(gids) else np.int64(-1)],
                "s_n_terms": [np.int64(n_terms_total)],
                "s_n_postings": [np.int64(n_pairs_total)],
            }
        )
        rows.append(seg_stat)
    else:
        # per-(doc, field) length rows for EXTRA fields (docs with >=1 token
        # only): lets a purging merge subtract exactly the reclaimed docs'
        # contribution from the field's docCount/sumTotalTermFreq without
        # decoding postings (the per-field liveDocs stats the SegmentMerger
        # recomputes by streaming; here a tiny metadata row instead)
        nz = doc_lens > 0
        if nz.any():
            fdoc_rows = pd.DataFrame(
                {
                    "row_type": "fdoc",
                    "seg": np.int64(seg_id),
                    "gid": gids[nz],
                    "term": pd.Series(
                        np.full(int(nz.sum()), field, dtype=object), dtype="string"
                    ),  # column reused: field name
                    "doc_len": doc_lens[nz].astype(np.int32),
                }
            )
            rows.append(fdoc_rows)
    # per-field collection stats (idf docCount + avgdl inputs are PER FIELD:
    # BM25Similarity.computeWeight uses the field's CollectionStatistics)
    field_stat = pd.DataFrame(
        {
            "row_type": ["fieldstat"],
            "seg": [np.int64(seg_id)],
            "term": pd.Series([field], dtype="string"),  # column reused: field name
            "s_doc_count": [np.int64(int((doc_lens > 0).sum()))],
            "s_sum_dl": [np.int64(int(doc_lens.sum()))],
        }
    )
    rows.append(field_stat)
    if as_frames:
        return rows
    # Assemble the union-schema frame column-by-column, bypassing pd.concat:
    # object-None padded columns made concat run elementwise NA checks over
    # every cell (~14% of invert wall). Integer columns become nullable
    # Int64 arrays built straight from (values, mask) — exact for gids
    # beyond 2^53 and null-preserving through Arrow; the rest pad with
    # object None.
    numeric = {
        "seg", "block_ord", "doc_count", "first_gid", "last_gid", "gid",
        "doc_len", "norm_b", "doc_freq", "total_term_freq",
        "s_n_docs", "s_doc_count", "s_sum_dl", "s_max_gid", "s_n_terms",
        "s_n_postings", "sort_val",
    }
    out: dict = {}
    sizes = [len(f) for f in rows]
    total = sum(sizes)
    for name in STAGING_SCHEMA.fieldNames():
        if name in numeric:
            vals = np.zeros(total, dtype=np.int64)
            mask = np.ones(total, dtype=bool)  # True = missing
            at = 0
            for frame, n in zip(rows, sizes):
                if name in frame.columns:
                    vals[at : at + n] = frame[name].to_numpy(dtype=np.int64)
                    mask[at : at + n] = False
                at += n
            out[name] = pd.arrays.IntegerArray(vals, mask)
        else:
            parts = [
                np.asarray(frame[name], dtype=object)
                if name in frame.columns
                else np.full(n, None, dtype=object)
                for frame, n in zip(rows, sizes)
            ]
            out[name] = np.concatenate(parts) if len(parts) > 1 else parts[0]
    return pd.DataFrame(out)


# --------------------------------------------------------------------- build


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.jsonl")


def read_manifest(index_dir: str) -> list[dict]:
    path = _manifest_path(index_dir)
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _append_manifest(index_dir: str, record: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    with open(_manifest_path(index_dir), "a") as f:
        f.write(json.dumps(record) + "\n")
        f.flush()
        os.fsync(f.fileno())


SEG_SHIFT = 40  # sparse gid = (seg << SEG_SHIFT) | rank_within_segment


def prepare_corpus(
    corpus: DataFrame,
    *,
    key_col: str,
    text_col: str,
    gid_col: str | None = None,
    n_segments: int = 8,
    dense_gids: bool = False,
    extra_fields: "dict[str, str] | None" = None,
    sort_by: "str | None" = None,
) -> tuple[DataFrame, dict]:
    """Attach deterministic (seg, gid) columns to a corpus.

    With ``gid_col``: segments are contiguous gid ranges (Parquet min/max
    stats prune resumed batches). Without: seg = xxhash64(key) % n_segments
    and gid orders docs by (segment, key). Default is *sparse* gids
    (seg << 40 | rank) which need no extra pass; ``dense_gids=True`` adds a
    count pass for Lucene-style dense numbering (DocIDMerger offset add) —
    within-segment doc gaps are identical either way.
    """
    xf_cols = [
        F.col(c).alias(f"xf_{f}") for f, c in sorted((extra_fields or {}).items())
    ]
    if gid_col is not None:
        bounds = corpus.agg(
            F.min(gid_col).alias("lo"), F.max(gid_col).alias("hi"), F.count("*").alias("n")
        ).collect()[0]
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
        span = hi - lo + 1
        per = max(1, -(-span // n_segments))  # ceil
        df = corpus.select(
            ((F.col(gid_col) - F.lit(lo)) / F.lit(per)).cast("long").alias("seg"),
            F.col(gid_col).cast("long").alias("gid"),
            F.col(key_col).cast("string").alias("key"),
            F.col(text_col).alias("text"),
            *xf_cols,
        )
        meta = {"mode": "gid", "lo": lo, "hi": hi, "n_docs": int(bounds["n"])}
        return df, meta

    sv_cols = (
        [F.expr(sort_by).cast("long").alias("sv")] if sort_by is not None else []
    )
    with_seg = corpus.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_segments)).cast("long").alias("seg"),
        F.col(key_col).cast("string").alias("key"),
        F.col(text_col).alias("text"),
        *sv_cols,
        *xf_cols,
    )
    if not dense_gids:
        df = with_seg.withColumn("base", (F.col("seg") * F.lit(1 << SEG_SHIFT)).cast("long"))
        return df, {"mode": "hash", "dense": False}
    counts = {int(r["seg"]): int(r["n"]) for r in with_seg.groupBy("seg").agg(F.count("*").alias("n")).collect()}
    bases, acc = {}, 0
    for s in range(n_segments):
        bases[s] = acc
        acc += counts.get(s, 0)
    base_expr = F.create_map(*[F.lit(x) for kv in bases.items() for x in kv])
    df = with_seg.withColumn("base", base_expr[F.col("seg")])
    meta = {"mode": "hash", "dense": True, "counts": counts, "bases": bases, "n_docs": acc}
    return df, meta


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    key_col: str,
    text_col: str,
    gid_col: str | None = None,
    n_segments: int = 8,
    batch_segments: int | None = None,
    with_positions: bool = True,
    with_offsets: bool = False,
    with_payloads: bool = False,
    dense_gids: bool = False,
    append: bool = False,
    fail_after_batches: int | None = None,
    extra_fields: "dict[str, str] | None" = None,
    direct_write: bool | None = None,
    sort_by: "str | None" = None,
    sort_ascending: bool = True,
    token_filter=None,
    char_filter: "str | None" = None,
    synonyms=None,
    stream_filter=None,
) -> dict:
    """Build (or resume) the index. Returns summary metrics.

    ``stream_filter``: a stream-level token filter applied after synonyms
    (e.g. ``functions/ngram.NGramFilter`` / ``EdgeNGramFilter``); must
    expose ``.apply(AnalyzedBatch)`` and ``.fingerprint()`` (recorded in
    stats.json; appends must present the same filter).

    ``char_filter="html"``: run HTMLStripCharFilter over ``text_col`` (and
    every extra field) before tokenization — index web pages straight off
    the raw html column. See ``invert_segment``.

    ``synonyms``: a ``functions/synonyms.SynonymMap`` applied at invert
    time (index-time SynonymGraphFilter); its fingerprint is recorded in
    stats.json and appends must present the same map (analyzer contract).

    ``direct_write``: workers write each segment's parquet files directly
    via pyarrow (one atomic-renamed file per row_type) and return only
    per-segment counts, skipping the Arrow-IPC hop back into the JVM and
    Spark's write stage. MEASURED SLOWER at every tried setting (A/B on
    the 2M-doc bench corpus at local[32]: 154-186s direct vs 94-150s
    Spark writer, interleaved reps): the default path pipelines Python
    invert compute with the JVM's parquet encode across groups, and that
    overlap is worth more than the saved IPC copy. Default False (Spark
    writer) everywhere; the option remains for shared-FS deployments that
    want worker-owned files and for re-measuring on real clusters, and
    requires the index dir reachable by path from every worker.

    ``extra_fields``: additional indexed text fields, ``{field: column}``
    (``text_col`` is the default field). Each field gets its own postings
    (qualified term keys), norms, and collection stats — the multi-field
    document model (``core/index/FieldInfos.java``); query with
    ``field:term`` syntax.

    ``append=True`` adds the corpus as NEW segments to an existing index
    (NRT-style incremental refresh, DirectoryReader.openIfChanged analog):
    batch and segment ids continue after the committed ones. With the
    default sparse gids, appended docIDs can never collide; with
    ``gid_col`` the caller must supply non-overlapping gids.

    ``fail_after_batches`` injects a crash after N committed batches — the
    kill/resume test hook (FIXTURES.md §6).

    ``sort_by``: index-time sort (IndexWriterConfig.setIndexSort,
    ``core/index/IndexSorter.java``): a corpus column (or SQL expression
    over the corpus) cast to long; each segment's docs are sorted by
    (sort value, key) and gids assigned in that order, so gid order
    within a segment IS sort order. The per-doc key is stored as
    ``sort_val`` on the doc rows, and the first k docs of every segment
    are exactly its k best by the sort — the early-terminating sorted
    collection Lucene gets from TopFieldCollector over a sorted index
    (``Searcher.sorted_index_topk``). Requires engine-assigned gids
    (hash mode): an explicit ``gid_col`` fixes docID order and conflicts
    with the sort. Merges preserve the invariant (gids never change and
    doc rows are left in place); appends must pass the same ``sort_by``.
    """
    if sort_by is not None and gid_col is not None:
        raise ValueError("sort_by requires engine-assigned gids (no gid_col)")
    if sort_by is not None and dense_gids:
        raise ValueError(
            "sort_by requires sparse gids (seg << SEG_SHIFT bases): the "
            "early-terminating reader derives per-segment head ranges from "
            "them"
        )
    t_start = time.time()
    # the index sort is fixed at creation (IndexWriterConfig.setIndexSort):
    # reject a mismatched append BEFORE any batch is built/committed
    stats_path = os.path.join(index_dir, "stats.json")
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            _prior_stats = json.load(f)
        prior_sort = _prior_stats.get("index_sort")
        if bool(_prior_stats.get("with_offsets")) != bool(with_offsets):
            raise ValueError(
                "with_offsets must match the existing index (IndexOptions "
                "are fixed per field at creation, FieldInfos)"
            )
        if bool(_prior_stats.get("with_payloads")) != bool(with_payloads):
            raise ValueError(
                "with_payloads must match the existing index (IndexOptions "
                "are fixed per field at creation, FieldInfos)"
            )
        if _prior_stats.get("char_filter") != char_filter_fingerprint(char_filter):
            raise ValueError(
                "char_filter must match the existing index (the analyzer "
                "chain is fixed at creation)"
            )
        _syn_fp = synonyms.fingerprint() if synonyms is not None else None
        if _prior_stats.get("synonyms_fp") != _syn_fp:
            raise ValueError(
                "synonyms must match the existing index (the analyzer "
                "chain is fixed at creation)"
            )
        _sf_fp = stream_filter.fingerprint() if stream_filter is not None else None
        if _prior_stats.get("stream_filter_fp") != _sf_fp:
            raise ValueError(
                "stream_filter must match the existing index (the analyzer "
                "chain is fixed at creation)"
            )
        if prior_sort is not None and (
            prior_sort.get("field") != sort_by
            or bool(prior_sort.get("ascending", True)) != bool(sort_ascending)
        ):
            raise ValueError(
                f"index is sorted by {prior_sort}; append must pass the "
                "same sort_by/sort_ascending (IndexWriterConfig."
                "setIndexSort is fixed at index creation)"
            )
        if prior_sort is None and sort_by is not None:
            raise ValueError(
                "existing index is unsorted; sort_by cannot be added after "
                "creation (IndexWriterConfig.setIndexSort is fixed)"
            )
    committed_recs = [
        rec
        for rec in read_manifest(index_dir)
        if rec.get("status") == "committed" and rec.get("batch") is not None
    ]
    batch_offset = 0
    seg_offset = 0
    if append and committed_recs:
        if batch_segments is None:
            batch_segments_eff = n_segments
        else:
            batch_segments_eff = batch_segments
        n_batches_job = -(-n_segments // batch_segments_eff)
        jobs = [r for r in read_manifest(index_dir) if r.get("type") == "append_job"]
        committed_ids = {r["batch"] for r in committed_recs}
        last = jobs[-1] if jobs else None
        if last is not None and not all(
            b in committed_ids
            for b in range(last["batch_offset"], last["batch_offset"] + last["n_batches"])
        ):
            # resume the crashed append job at its original offsets
            batch_offset = last["batch_offset"]
            seg_offset = last["seg_offset"]
        else:
            batch_offset = max(r["batch"] for r in committed_recs) + 1
            seg_offset = 1 + max(
                int(s) for r in committed_recs for s in r.get("per_segment", {"-1": 0})
            )
            _append_manifest(
                index_dir,
                {
                    "type": "append_job",
                    "batch_offset": batch_offset,
                    "seg_offset": seg_offset,
                    "n_batches": n_batches_job,
                    "ts": time.time(),
                },
            )
    df, meta = prepare_corpus(
        corpus, key_col=key_col, text_col=text_col, gid_col=gid_col,
        n_segments=n_segments, dense_gids=dense_gids, extra_fields=extra_fields,
        sort_by=sort_by,
    )
    if seg_offset:
        df = df.withColumn("seg", F.col("seg") + F.lit(seg_offset))
        if meta.get("dense") is False and gid_col is None:
            df = df.withColumn("base", (F.col("seg") * F.lit(1 << SEG_SHIFT)).cast("long"))
    mode = meta["mode"]
    if batch_segments is None:
        batch_segments = n_segments

    committed = {r["batch"] for r in committed_recs}
    seg_batches = [
        (batch_offset + bi, [seg_offset + s for s in range(b, min(b + batch_segments, n_segments))])
        for bi, b in enumerate(range(0, n_segments, batch_segments))
    ]

    def make_builder(with_positions: bool, mode: str, direct_out: "str | None" = None):
        fields = sorted((extra_fields or {}).keys())

        def invert_all(pdf: pd.DataFrame, seg: int, as_frames: bool):
            if sort_by is not None:
                # index sort: docID order within the segment = sort order
                pdf = pdf.sort_values(
                    ["sv", "key"], ascending=[sort_ascending, True],
                    kind="mergesort",
                )
            else:
                pdf = pdf.sort_values(
                    "key" if mode == "hash" else "gid", kind="mergesort"
                )
            if mode == "hash":
                gids = (np.arange(len(pdf), dtype=np.int64) + int(pdf["base"].iloc[0]))
            else:
                gids = pdf["gid"].to_numpy(dtype=np.int64)
            keys = pdf["key"].to_numpy()
            sv = (
                pdf["sv"].to_numpy(dtype=np.int64)
                if sort_by is not None else None
            )
            frames = invert_segment(
                seg, gids, keys, pdf["text"],
                with_positions=with_positions, as_frames=as_frames,
                sort_vals=sv, with_offsets=with_offsets,
                with_payloads=with_payloads, token_filter=token_filter,
                char_filter=char_filter, synonyms=synonyms,
                stream_filter=stream_filter,
            )
            frames = frames if as_frames else [frames]
            for f in fields:
                more = invert_segment(
                    seg, gids, keys, pdf[f"xf_{f}"],
                    with_positions=with_positions, field=f, as_frames=as_frames,
                    with_offsets=with_offsets, with_payloads=with_payloads,
                    token_filter=token_filter, char_filter=char_filter,
                    synonyms=synonyms, stream_filter=stream_filter,
                )
                frames.extend(more if as_frames else [more])
            return frames

        if direct_out is not None:
            def fn(pdf: pd.DataFrame) -> pd.DataFrame:
                seg = int(pdf["seg"].iloc[0])
                frames = invert_all(pdf, seg, as_frames=True)
                n = write_segment_parquet(frames, direct_out, seg)
                return pd.DataFrame({"seg": [np.int64(seg)], "n_rows": [np.int64(n)]})
        else:
            def fn(pdf: pd.DataFrame) -> pd.DataFrame:
                frames = invert_all(pdf, int(pdf["seg"].iloc[0]), as_frames=False)
                return frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)

        return fn

    if direct_write is None:
        direct_write = False
    if direct_write and "://" in index_dir:
        raise ValueError("direct_write requires a path-reachable index dir")
    total_new = 0
    for bi, segs in seg_batches:
        if bi in committed:
            continue
        t0 = time.time()
        sub = df.filter(F.col("seg").isin([int(s) for s in segs]))
        out_path = os.path.join(index_dir, "segments", f"batch={bi}")
        if direct_write:
            # overwrite semantics: clear any partial output from a crashed
            # attempt, then the workers write + atomically rename per-seg
            # files; the manifest line below is still the commit point
            if os.path.exists(out_path):
                import shutil

                shutil.rmtree(out_path)
            os.makedirs(out_path, exist_ok=True)
            builder = make_builder(with_positions, mode, direct_out=out_path)
            sub.groupBy("seg").applyInPandas(
                builder, schema="seg long, n_rows long"
            ).collect()
        else:
            builder = make_builder(with_positions, mode)
            staged = sub.groupBy("seg").applyInPandas(builder, schema=STAGING_SCHEMA)
            staged.write.mode("overwrite").partitionBy("row_type").parquet(out_path)
        wall = time.time() - t0
        # lineage + metrics from the tiny segstat rows (driver-side pyarrow
        # read of a handful of rows — no extra Spark job)
        seg_pdf = _read_segstats(out_path)
        seg_stats = {
            int(r.seg): {
                "n_docs": int(r.s_n_docs),
                "n_terms": int(r.s_n_terms),
                "n_postings": int(r.s_n_postings),
            }
            for r in seg_pdf.itertuples(index=False)
        }
        n_docs_batch = sum(s["n_docs"] for s in seg_stats.values())
        _append_manifest(
            index_dir,
            {
                "batch": bi,
                "status": "committed",
                "segments": segs,
                "per_segment": seg_stats,
                "n_docs": n_docs_batch,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs_batch / wall, 1) if wall > 0 else None,
                "lineage": {"mode": mode, "n_segments": n_segments, "batch_segments": batch_segments},
                "ts": time.time(),
            },
        )
        total_new += n_docs_batch
        if fail_after_batches is not None and bi + 1 >= fail_after_batches:
            raise RuntimeError(f"injected failure after batch {bi}")

    finalize_index(spark, index_dir)
    if (sort_by is not None or with_offsets or with_payloads or char_filter
            or synonyms is not None or stream_filter is not None):
        with open(stats_path) as f:
            stats = json.load(f)
        if sort_by is not None:
            stats["index_sort"] = {
                "field": sort_by, "ascending": bool(sort_ascending),
            }
        if with_offsets:
            stats["with_offsets"] = True
        if with_payloads:
            stats["with_payloads"] = True
        if char_filter:
            stats["char_filter"] = char_filter_fingerprint(char_filter)
        if synonyms is not None:
            stats["synonyms_fp"] = synonyms.fingerprint()
        if stream_filter is not None:
            stats["stream_filter_fp"] = stream_filter.fingerprint()
        with open(stats_path, "w") as f:
            json.dump(stats, f)
    return {
        "n_docs_new": total_new,
        "n_batches": len(seg_batches),
        "wall_sec": time.time() - t_start,
        "meta": meta,
    }


def _sum_field_stats(into: "dict[str, dict]", add: "dict[str, dict]") -> None:
    for f, s in add.items():
        cur = into.setdefault(f, {"doc_count": 0, "sum_ttf": 0})
        cur["doc_count"] += int(s["doc_count"])
        cur["sum_ttf"] += int(s["sum_ttf"])


def _batch_field_stats(index_dir: str, batch: int) -> "dict[str, dict]":
    """Per-field stats of one build batch, from its fieldstat rows."""
    fagg = _read_fieldstats(
        os.path.join(index_dir, "segments", f"batch={int(batch)}")
    )
    return {
        str(field): {
            "doc_count": int(grp["s_doc_count"].sum()),
            "sum_ttf": int(grp["s_sum_dl"].sum()),
        }
        for field, grp in fagg.groupby("term")
    }


def unit_field_stats(index_dir: str, unit: dict) -> "dict[str, dict]":
    """Per-field stat contribution of one live unit.

    Batch units read their fieldstat rows; merge units carry
    ``unit_field_stats`` in their manifest record (inputs' sum, minus the
    purged docs' per-field contribution for purging merges). Legacy merge
    records without the field fall back to their covered batches' sums —
    exact for them, since legacy purges rejected multi-field indexes and
    the default field is overridden from global doc stats anyway.
    """
    from .merge import _merge_rec_by_uid

    if unit["uid"].startswith("b"):
        return _batch_field_stats(index_dir, int(unit["uid"][1:]))
    rec = _merge_rec_by_uid(index_dir, unit["uid"]) or {}
    fs = rec.get("unit_field_stats")
    if fs is not None:
        return {str(k): dict(v) for k, v in fs.items()}
    out: dict[str, dict] = {}
    for b in rec.get("merged_batches", []):
        _sum_field_stats(out, _batch_field_stats(index_dir, int(b)))
    return out


def _write_terms_tables(terms, index_dir: str) -> None:
    """Write the sorted term dictionary AND its reversed twin, each via
    write-to-temp + atomic rename.

    ``terms/``      term-sorted   -> prefix seeks prune parquet row groups
    ``terms_rev/``  rterm-sorted  -> suffix seeks (leading wildcards: *ing,
                                     .*foo) become prefix seeks on rterm

    The reversed table is the Spark analog of indexing reversed terms for
    leading-wildcard queries (Lucene's ReversedWildcardFilter trade — pay
    a second small dictionary to avoid a full-dictionary scan per query;
    the blocktree automaton intersect has no Parquet analog).

    The twin is derived by READING BACK the just-written ``terms`` parquet
    — never by re-executing the caller's ``terms`` plan. That plan is the
    groupBy shuffle over every segment's term rows; running it twice
    doubled finalize (the round-4 high-parallelism build regression). The
    read-back job is a projection + within-partition sort over the compact
    vocab table, O(|vocab|) with no shuffle."""
    import shutil

    def _commit(df, name: str) -> str:
        tmp = os.path.join(index_dir, f"{name}_new")
        df.write.mode("overwrite").parquet(tmp)
        final = os.path.join(index_dir, name)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        return final

    terms_path = _commit(terms, "terms")
    spark = terms.sparkSession
    rev = (
        spark.read.parquet(terms_path)
        .withColumn("rterm", F.reverse(F.col("term")))
        .select("rterm", "term", "doc_freq", "total_term_freq")
        .sortWithinPartitions("rterm")
    )
    _commit(rev, "terms_rev")


def _finalize_from_live_units(spark: SparkSession, index_dir: str) -> None:
    """Live-unit stats view (used once any purged merge exists).

    Every live unit contributes its own term rows / survivor aggregates,
    its doc stats, and its per-field stats: batch units from their
    term/fieldstat rows (deleted-but-unpurged docs still count — Lucene
    pre-merge semantics), merged units from their block metadata and
    manifest-recorded ``unit_doc_stats`` / ``unit_field_stats``.
    """
    from .merge import _merge_rec_by_uid, live_units

    units = live_units(index_dir)
    term_parts = []
    doc_stats = {"n_rows": 0, "doc_count": 0, "sum_dl": 0}
    field_stats: dict[str, dict] = {}
    for u in units:
        if u["uid"].startswith("b"):
            p = os.path.join(
                index_dir, "segments",
                f"batch={int(u['uid'][1:])}", "row_type=term",
            )
            term_parts.append(
                spark.read.parquet(p).select("term", "doc_freq", "total_term_freq")
            )
            from .merge import _batch_doc_stats

            s = _batch_doc_stats(index_dir, int(u["uid"][1:]))
        else:
            mp = os.path.join(index_dir, u["path"])
            term_parts.append(
                spark.read.parquet(mp)
                .groupBy("term")
                .agg(
                    F.sum("doc_count").cast("long").alias("doc_freq"),
                    F.sum("freq_sum").cast("long").alias("total_term_freq"),
                )
            )
            rec = _merge_rec_by_uid(index_dir, u["uid"])
            s = (rec or {}).get("unit_doc_stats") or {
                "n_rows": 0, "doc_count": 0, "sum_dl": 0
            }
        _sum_field_stats(field_stats, unit_field_stats(index_dir, u))
        for k in doc_stats:
            doc_stats[k] += s[k]
    df = term_parts[0]
    for p in term_parts[1:]:
        df = df.unionByName(p)
    terms = (
        df.groupBy("term")
        .agg(
            F.sum("doc_freq").alias("doc_freq"),
            F.sum("total_term_freq").alias("total_term_freq"),
        )
        .sortWithinPartitions("term")
    )
    _write_terms_tables(terms, index_dir)

    stats_path = os.path.join(index_dir, "stats.json")
    stats = {}
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
    max_gid = stats.get("max_gid", -1)
    for d in sorted(os.listdir(os.path.join(index_dir, "segments"))):
        if d.startswith("batch="):
            seg = _read_segstats(os.path.join(index_dir, "segments", d))
            if len(seg):
                max_gid = max(max_gid, int(seg["s_max_gid"].max()))
    stats.update(
        {
            "n_rows": doc_stats["n_rows"],
            "doc_count": doc_stats["doc_count"],
            "sum_total_term_freq": doc_stats["sum_dl"],
            "max_gid": int(max_gid),
        }
    )
    from ..plans.fields import DEFAULT_FIELD

    fields = field_stats if field_stats else dict(stats.get("fields") or {})
    # the default field's doc rows are the authoritative survivor view
    fields[DEFAULT_FIELD] = {
        "doc_count": stats["doc_count"],
        "sum_ttf": stats["sum_total_term_freq"],
    }
    stats["fields"] = fields
    with open(stats_path, "w") as f:
        json.dump(stats, f)


def _read_segstats(path: str) -> pd.DataFrame:
    """Driver-side read of the tiny segstat rows (one per segment)."""
    import pyarrow.dataset as ds

    sub = os.path.join(path, "row_type=segstat")
    cols = ["seg", "s_n_docs", "s_doc_count", "s_sum_dl", "s_max_gid", "s_n_terms", "s_n_postings"]
    return ds.dataset(sub, format="parquet").to_table(columns=cols).to_pandas()


def _read_fieldstats(path: str) -> pd.DataFrame:
    """Driver-side read of the per-(segment, field) stat rows."""
    import pyarrow.dataset as ds

    sub = os.path.join(path, "row_type=fieldstat")
    if not os.path.isdir(sub):  # pre-multi-field index layout
        return pd.DataFrame(columns=["term", "s_doc_count", "s_sum_dl"])
    cols = ["term", "s_doc_count", "s_sum_dl"]
    return ds.dataset(sub, format="parquet").to_table(columns=cols).to_pandas()


def fdoc_paths(index_dir: str, batches: "Iterable[int]") -> "list[str]":
    """Existing per-(doc, extra-field) length row dirs for the batches
    (absent on single-field indexes and pre-fdoc layouts)."""
    out = []
    for b in batches:
        p = os.path.join(index_dir, "segments", f"batch={int(b)}", "row_type=fdoc")
        if os.path.isdir(p):
            out.append(p)
    return out


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    *,
    gids: "Iterable[int] | None" = None,
    query=None,
) -> dict:
    """Mark docs deleted (live-docs layer, Lucene90LiveDocsFormat analog).

    Deletes by explicit docIDs or by query (IndexWriter.deleteDocuments).
    Semantics are exactly Lucene's pre-merge behavior: deleted docs vanish
    from every search/count result, while collection stats, docFreq and
    norms still include them until a merge reclaims the space — so
    surviving docs' scores are UNCHANGED by a delete.

    The delete set is written as a parquet of gids + a manifest commit
    (the ``.liv`` bitset analog; append-only, unioned at read time).
    """
    from ..operators.search import Searcher

    if (gids is None) == (query is None):
        raise ValueError("exactly one of gids / query required")
    recs = read_manifest(index_dir)
    n_prev = sum(1 for r in recs if r.get("type") == "delete")
    rel = os.path.join("deletes", f"del_{n_prev}")
    out_path = os.path.join(index_dir, rel)
    if gids is not None:
        df = spark.createDataFrame([(int(g),) for g in gids], "gid long")
    else:
        s = Searcher(spark, index_dir)
        node = query
        if isinstance(query, str):
            from ..plans.query import parse_query

            node = parse_query(query)
        df = s.candidates(node, k=1 << 62, prune=False).select("gid").distinct()
    return _commit_delete_df(spark, index_dir, df, rel, out_path)


def _commit_delete_df(spark, index_dir: str, df: DataFrame, rel: str,
                      out_path: str) -> dict:
    """Write a gid DataFrame as a committed delete record (.liv analog)."""
    df.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    rec = {
        "type": "delete",
        "status": "committed",
        "path": rel,
        "n_docs": int(n),
        "ts": time.time(),
    }
    _append_manifest(index_dir, rec)
    return rec


def update_documents(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    key_col: str,
    text_col: str,
    gid_col: str | None = None,
    n_segments: int = 4,
    with_positions: bool = True,
    with_offsets: bool = False,
    with_payloads: bool = False,
    extra_fields: "dict[str, str] | None" = None,
    sort_by: "str | None" = None,
    sort_ascending: bool = True,
) -> dict:
    """IndexWriter.updateDocument analog: replace every indexed doc whose
    key matches an incoming row's key, then add the incoming rows as new
    segments (``core/index/IndexWriter.java`` updateDocument = atomic
    delete-by-term + add; the replaced doc keeps its application key but
    gets a NEW docID, and its old copy stays deleted-but-counted in
    collection stats until a merge reclaims it).

    Keys absent from the index are plain adds (upsert semantics). The old
    gids are resolved DISTRIBUTED — incoming keys broadcast against the
    doc table, no collect — so an update batch of any size works.

    Crash window: the delete commits before the append job. A crash
    between them leaves the keys absent until the same call is re-run
    (the append resumes from its manifest record); Lucene's single-writer
    commit makes the pair atomic, this two-record form is the documented
    deviation.
    """
    from ..operators.search import Searcher

    keys = docs.select(
        F.col(key_col).cast("string").alias("key")
    ).distinct()
    old_gids = (
        Searcher(spark, index_dir)
        .doc_rows()
        .join(F.broadcast(keys), on="key", how="left_semi")
        .select("gid")
        .distinct()
    )
    recs = read_manifest(index_dir)
    n_prev = sum(1 for r in recs if r.get("type") == "delete")
    rel = os.path.join("deletes", f"del_{n_prev}")
    del_rec = _commit_delete_df(
        spark, index_dir, old_gids, rel, os.path.join(index_dir, rel)
    )
    add_stats = build_index(
        spark, docs, index_dir,
        key_col=key_col, text_col=text_col, gid_col=gid_col,
        n_segments=n_segments, with_positions=with_positions,
        with_offsets=with_offsets, with_payloads=with_payloads,
        extra_fields=extra_fields, append=True,
        sort_by=sort_by, sort_ascending=sort_ascending,
    )
    return {"n_deleted": del_rec["n_docs"], "add": add_stats}


def finalize_index(spark: SparkSession, index_dir: str) -> None:
    """Global term stats + collection stats (idf/avgdl inputs are GLOBAL).

    The terms table is the only Spark job (a groupBy shuffle over per-segment
    term rows); collection stats aggregate the per-segment segstat rows on
    the driver. Term rows are written sorted-within-partition so Parquet
    row-group min/max stats act as the term index (the FST analog) without a
    range-partitioner sampling pass.

    Once a PURGED merge exists, the all-batches aggregation would resurrect
    reclaimed docs' stats, so finalize switches to the live-unit view:
    batch units contribute their term rows (deleted-but-unpurged docs still
    count — Lucene pre-merge semantics), merged units contribute survivor
    aggregates from their block metadata.
    """
    purged_ever = any(
        r.get("type") == "merge" and r.get("status") == "committed" and r.get("purged")
        for r in read_manifest(index_dir)
    )
    if purged_ever:
        _finalize_from_live_units(spark, index_dir)
        return
    term_glob = os.path.join(index_dir, "segments", "batch=*", "row_type=term")
    terms = (
        spark.read.parquet(term_glob)
        .groupBy("term")
        .agg(
            F.sum("doc_freq").alias("doc_freq"),
            F.sum("total_term_freq").alias("total_term_freq"),
        )
        .sortWithinPartitions("term")
    )
    _write_terms_tables(terms, index_dir)

    batch_dirs = [
        os.path.join(index_dir, "segments", d)
        for d in sorted(os.listdir(os.path.join(index_dir, "segments")))
        if d.startswith("batch=")
    ]
    agg = pd.concat([_read_segstats(d) for d in batch_dirs], ignore_index=True)
    stats = {}
    prior_stats_path = os.path.join(index_dir, "stats.json")
    if os.path.exists(prior_stats_path):
        # preserve build-time metadata (index_sort) across re-finalizes
        with open(prior_stats_path) as f:
            stats = {
                k: v for k, v in json.load(f).items() if k == "index_sort"
            }
    stats.update({
        "n_rows": int(agg["s_n_docs"].sum()),
        "doc_count": int(agg["s_doc_count"].sum()),
        "sum_total_term_freq": int(agg["s_sum_dl"].sum()),
        "max_gid": int(agg["s_max_gid"].max()) if len(agg) else -1,
    })
    fagg = pd.concat([_read_fieldstats(d) for d in batch_dirs], ignore_index=True)
    if len(fagg):
        stats["fields"] = {
            str(field): {
                "doc_count": int(grp["s_doc_count"].sum()),
                "sum_ttf": int(grp["s_sum_dl"].sum()),
            }
            for field, grp in fagg.groupby("term")
        }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f)
