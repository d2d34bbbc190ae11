"""Index integrity checker (CheckIndex analog, core/index/CheckIndex.java).

Verifies, distributed (one pass over postings + docs, no collect of data):

  1. postings well-formed per block: decoded doc count == doc_count column,
     gids strictly ascending WITHIN each block and no doc repeated across a
     term's blocks (block RANGES may interleave after tiered partial
     merges; the reader restores global order), freqs >= 1, every
     (freq, norm) bounded by the block's impact frontier; the position
     stream decodes to exactly sum(freq) entries, and any offset/payload
     streams are position-aligned (CheckIndex.checkFields' postings/
     positions/payload consistency pass);
  2. term stats consistent: sum of per-block doc counts == terms.doc_freq,
     sum of freqs == terms.total_term_freq;
  3. docs table: gids unique, norm_b == int_to_byte4(doc_len);
  4. collection stats: stats.json doc_count/sum_ttf match the docs table;
  5. manifest: every committed batch directory exists.

Returns a dict of violation counts (all zeros == healthy). Runs after
merges and on resume (the north rule's lineage/metrics audit hook).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, functions as F, types as T

from ..functions.pfor import decode_stream
from ..functions.smallfloat import int_to_byte4_np
from .indexer import read_manifest

_BLOCK_REPORT = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_count_sum", T.LongType()),
        T.StructField("freq_sum", T.LongType()),
        T.StructField("bad_doc_count", T.LongType()),
        T.StructField("bad_order", T.LongType()),
        T.StructField("bad_freq", T.LongType()),
        T.StructField("bad_impact", T.LongType()),
        T.StructField("bad_streams", T.LongType()),
    ]
)


def _check_term_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("first_gid", kind="mergesort")
    bad_doc_count = bad_order = bad_freq = bad_impact = bad_streams = 0
    doc_count_sum = freq_sum = 0
    has_pos = "positions" in pdf.columns
    has_off = "off_starts" in pdf.columns
    has_pay = "payloads" in pdf.columns
    all_gids = []
    for r in pdf.itertuples(index=False):
        gaps = decode_stream(r.gids).astype(np.int64)
        g = np.empty(len(gaps) + 1, dtype=np.int64)
        g[0] = r.first_gid
        if len(gaps):
            g[1:] = r.first_gid + np.cumsum(gaps)
        f = decode_stream(r.freqs).astype(np.int64)
        n = decode_stream(r.norms).astype(np.int64)
        doc_count_sum += len(g)
        freq_sum += int(f.sum())
        if len(g) != int(r.doc_count) or len(f) != len(g) or len(n) != len(g):
            bad_doc_count += 1
        # within-block order must be strict; ACROSS blocks ranges may
        # interleave (tiered partial merges re-cut across gid holes other
        # live units occupy — the reader restores global order), but no doc
        # may appear twice for one term, checked over the full set below
        if (np.diff(g) <= 0).any():
            bad_order += 1
        all_gids.append(g)
        if (f < 1).any():
            bad_freq += 1
        # impact frontier must dominate every (freq, norm) in the block:
        # for each posting there is a frontier entry with freq' >= freq and
        # norm' <= norm (CompetitiveImpactAccumulator contract)
        imp_f = np.asarray(r.imp_freqs, dtype=np.int64)
        imp_n = np.asarray(r.imp_norms, dtype=np.int64)
        for freq, norm in zip(f, n):
            if not ((imp_f >= freq) & (imp_n <= norm)).any():
                bad_impact += 1
                break
        # stream alignment: positions/offsets/payloads must decode to
        # exactly sum(freq) entries per block
        want = int(f.sum())

        def _stream_len(buf) -> int:
            try:
                return len(decode_stream(buf))
            except Exception:
                return -1

        if has_pos and r.positions is not None:
            if _stream_len(r.positions) != want:
                bad_streams += 1
        if has_off and r.off_starts is not None:
            if (_stream_len(r.off_starts) != want
                    or _stream_len(r.off_lens) != want):
                bad_streams += 1
        if has_pay and r.payloads is not None:
            if _stream_len(r.payloads) != want:
                bad_streams += 1
    if all_gids:
        merged = np.concatenate(all_gids)
        if len(np.unique(merged)) != len(merged):
            bad_order += 1  # a doc appears twice for this term
    return pd.DataFrame(
        [
            {
                "term": pdf["term"].iloc[0],
                "doc_count_sum": doc_count_sum,
                "freq_sum": freq_sum,
                "bad_doc_count": bad_doc_count,
                "bad_order": bad_order,
                "bad_freq": bad_freq,
                "bad_impact": bad_impact,
                "bad_streams": bad_streams,
            }
        ]
    )


def check_index(spark: SparkSession, index_dir: str) -> dict:
    from .search import Searcher

    s = Searcher(spark, index_dir)
    report: dict = {}

    # 0: manifest ↔ directories FIRST — the postings scan reads each live
    # unit's path directly (no glob), so a missing dir must be diagnosed
    # here, not crash the audit below
    missing = 0
    for rec in read_manifest(index_dir):
        if rec.get("status") == "committed" and rec.get("batch") is not None:
            if not os.path.isdir(os.path.join(index_dir, "segments", f"batch={rec['batch']}")):
                missing += 1
        if rec.get("type") == "merge" and rec.get("status") == "committed":
            out = rec.get("out", "postings_merged")
            if not os.path.isdir(os.path.join(index_dir, out)):
                missing += 1
    report["missing_batch_dirs"] = missing
    if missing:
        report.update(
            {k: -1 for k in (
                "bad_doc_count", "bad_order", "bad_freq", "bad_impact",
                "bad_streams",
                "term_doc_freq_mismatch", "term_ttf_mismatch", "dup_gids",
                "bad_norms", "stats_doc_count_mismatch", "stats_ttf_mismatch",
            )}
        )
        report["healthy"] = False
        return report

    # 1+2: per-term block audit, then join against the terms table
    audit_cols = ["term", "doc_count", "first_gid", "gids", "freqs",
                  "norms", "positions", "imp_freqs", "imp_norms"]
    if s.stats.get("with_offsets"):
        audit_cols += ["off_starts", "off_lens"]
    if s.stats.get("with_payloads"):
        audit_cols.append("payloads")
    per_term = (
        s._postings_df()
        .select(*audit_cols)
        .groupBy("term")
        .applyInPandas(lambda pdf: _check_term_blocks(pdf), schema=_BLOCK_REPORT)
    )
    terms = spark.read.parquet(os.path.join(index_dir, "terms"))
    joined = per_term.join(terms, "term", "full_outer")
    agg = joined.agg(
        F.sum("bad_doc_count").alias("bad_doc_count"),
        F.sum("bad_order").alias("bad_order"),
        F.sum("bad_freq").alias("bad_freq"),
        F.sum("bad_impact").alias("bad_impact"),
        F.sum("bad_streams").alias("bad_streams"),
        F.sum(
            (F.coalesce("doc_count_sum", F.lit(-1)) != F.coalesce("doc_freq", F.lit(-2)))
            .cast("long")
        ).alias("term_doc_freq_mismatch"),
        F.sum(
            (F.coalesce("freq_sum", F.lit(-1)) != F.coalesce("total_term_freq", F.lit(-2)))
            .cast("long")
        ).alias("term_ttf_mismatch"),
    ).collect()[0]
    report.update({k: int(agg[k] or 0) for k in agg.asDict()})

    # 3: docs table. Doc rows of PURGED deletes still exist on disk (only
    # postings + stats were reclaimed), so exclude exactly the docs purging
    # merges reclaimed before comparing against stats.json; unpurged
    # deletes still count in stats (Lucene pre-merge semantics). New-format
    # purge records carry their exact ``purged_gids``; legacy full-merge
    # purges (no such record) consumed every delete set committed before
    # them.
    docs = s.doc_rows()
    purged_gid_paths: list = []
    legacy_delete_paths: list = []
    pending: list = []
    for rec in read_manifest(index_dir):
        if rec.get("type") == "delete" and rec.get("status") == "committed":
            pending.append(rec["path"])
        if (rec.get("type") == "merge" and rec.get("status") == "committed"
                and rec.get("purged")):
            if rec.get("purged_gids"):
                purged_gid_paths.append(rec["purged_gids"])
            else:
                legacy_delete_paths.extend(pending)
                pending = []
    all_paths = purged_gid_paths + legacy_delete_paths
    if all_paths:
        from .merge import read_delete_paths

        gids = read_delete_paths(index_dir, all_paths)
        ddf = spark.createDataFrame(pd.DataFrame({"gid": gids.astype("int64")}))
        docs = docs.join(F.broadcast(ddf), "gid", "left_anti")
    n_docs = docs.count()
    report["dup_gids"] = int(n_docs - docs.select("gid").distinct().count())
    # doc_len domain is small, so precompute the norm mapping driver-side
    # and check JVM-side via a literal map (no UDF)
    lens = [r["doc_len"] for r in docs.select("doc_len").distinct().collect()]
    mapping = {int(dl): int(int_to_byte4_np(np.array([dl]))[0]) for dl in lens}
    map_expr = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    report["bad_norms"] = int(
        docs.filter(map_expr[F.col("doc_len")] != F.col("norm_b")).count()
    )

    # 4: collection stats
    stats = s.stats
    actual = docs.agg(
        F.sum((F.col("doc_len") > 0).cast("long")).alias("dc"),
        F.sum("doc_len").alias("ttf"),
    ).collect()[0]
    report["stats_doc_count_mismatch"] = int(stats["doc_count"] != int(actual["dc"] or 0))
    report["stats_ttf_mismatch"] = int(
        stats["sum_total_term_freq"] != int(actual["ttf"] or 0)
    )

    report["healthy"] = all(
        v == 0 for k, v in report.items() if k not in ("healthy",)
    )
    return report
