"""Global merge + incremental append tests.

Mirrors SegmentMerger semantics (SURVEY.md §2c): a merged index must answer
every query with IDENTICAL docIDs and float32 scores (collection stats are
unchanged by merging), posting lists must decode to exactly the pre-merge
postings, and tail blocks from many segments must fuse into fuller blocks.
Salting splits hot terms by gid range without changing results.
"""

import os

import numpy as np
import pandas as pd
import pytest

from lucene_spark.operators import indexer, merge
from lucene_spark.operators.oracle import BruteForceIndex
from lucene_spark.operators.search import Searcher, decode_term_blocks
from lucene_spark.plans.query import BoolQ, TermQ
from lucene_spark.sources.webtext import generate_pages_pdf

N_DOCS = 600


@pytest.fixture(scope="module")
def corpus_pdf():
    pdf = generate_pages_pdf(0, N_DOCS, seed=11)
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    pdf["gid"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


@pytest.fixture(scope="module")
def merged_index(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_m"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "text"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="text", gid_col="gid",
        n_segments=8, batch_segments=2,
    )
    return d


def _postings_map(spark, index_dir, term, merged_only=False):
    s = Searcher(spark, index_dir)
    pdf = s._postings_df().filter(f"term = '{term}'").toPandas()
    if merged_only:
        pdf = pdf[pdf["seg"] == -1]
    tp = decode_term_blocks(pdf, need_positions=True)
    return tp, pdf


def test_merge_preserves_results_and_fuses_blocks(spark, merged_index, corpus_pdf):
    s_before = Searcher(spark, merged_index)
    oracle = BruteForceIndex(corpus_pdf["gid"], corpus_pdf["url"], corpus_pdf["text"])
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    mid = sorted(oracle.postings, key=lambda t: len(oracle.postings[t]))[len(oracle.postings) // 2]

    pre_rows = s_before._postings_df().count()
    queries = [TermQ(hot), BoolQ(must=(TermQ(hot), TermQ(mid))), BoolQ(should=(TermQ(hot), TermQ(mid)))]
    before = [s_before.search(q, k=10) for q in queries]

    # salt_docs tiny -> hot terms genuinely salted
    rec = merge.merge_index(spark, merged_index, salt_docs=100)
    assert rec["n_hot_terms"] >= 1

    s_after = Searcher(spark, merged_index)
    post_rows = s_after._postings_df().count()
    assert post_rows < pre_rows, "merge should fuse tail blocks into fewer rows"

    for q, want in zip(queries, before):
        got = s_after.search(q, k=10)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    # postings decode identically to the oracle after merge
    tp, pdf = _postings_map(spark, merged_index, mid)
    want_p = oracle.postings[mid]
    assert tp.gids.tolist() == sorted(want_p)
    assert tp.freqs.tolist() == [want_p[g] for g in sorted(want_p)]
    for g, pos in zip(tp.gids, tp.positions):
        assert pos.tolist() == oracle.positions[(mid, int(g))]
    assert (pdf["seg"] == -1).all(), "post-merge scan must serve from merged table"

    # hot term was split by gid range: salted groups -> multiple partial
    # blocks are allowed, but ordering/decode must still be globally sorted
    tp_hot, _ = _postings_map(spark, merged_index, hot)
    assert (np.diff(tp_hot.gids) > 0).all()
    assert tp_hot.gids.tolist() == sorted(oracle.postings[hot])


def test_incremental_append_after_merge(spark, merged_index, corpus_pdf):
    extra = generate_pages_pdf(10_000, 10_400, seed=11).sort_values("url").reset_index(drop=True)
    extra["gid"] = np.arange(100_000, 100_000 + len(extra), dtype=np.int64)
    df = spark.createDataFrame(extra[["gid", "url", "text"]])
    indexer.build_index(
        spark, df, merged_index, key_col="url", text_col="text", gid_col="gid",
        n_segments=2, append=True,
    )
    both = pd.concat([corpus_pdf, extra], ignore_index=True)
    oracle = BruteForceIndex(both["gid"], both["url"], both["text"])
    s = Searcher(spark, merged_index)
    assert s.stats["doc_count"] == oracle.doc_count
    assert s.stats["sum_total_term_freq"] == oracle.sum_ttf

    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    want = oracle.search(TermQ(hot), 10)
    got = s.search(TermQ(hot), k=10)
    assert list(got["gid"]) == [g for g, _, _ in want]
    for gs, (_, _, ws) in zip(got["score"], want):
        assert np.float32(gs) == np.float32(ws)


def test_tiered_incremental_merge(spark, tmp_path_factory):
    """TieredMergePolicy analog: appends accumulate units; each
    tiered_merge call folds ONE tier (never the whole index); results and
    check_index stay identical throughout."""
    from lucene_spark.operators.check import check_index
    from lucene_spark.operators.merge import live_units, tiered_merge

    d = str(tmp_path_factory.mktemp("idx_tiered"))
    oracle_frames = []
    base = 0
    for i in range(3):  # 3 sequential appends (the first creates the index)
        pdf = generate_pages_pdf(1000 * i, 1000 * i + 200, seed=5).sort_values(
            "url"
        ).reset_index(drop=True)
        pdf["gid"] = np.arange(base, base + len(pdf), dtype=np.int64)
        base += 10_000
        oracle_frames.append(pdf)
        df = spark.createDataFrame(pdf[["gid", "url", "text"]])
        indexer.build_index(
            spark, df, d, key_col="url", text_col="text", gid_col="gid",
            n_segments=2, batch_segments=1, append=(i > 0),
        )
    all_pdf = pd.concat(oracle_frames, ignore_index=True)
    oracle = BruteForceIndex(all_pdf["gid"], all_pdf["url"], all_pdf["text"])
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    mid = sorted(oracle.postings, key=lambda t: len(oracle.postings[t]))[
        len(oracle.postings) // 2
    ]
    from lucene_spark.functions.analysis import analyze_batch
    from lucene_spark.plans.query import PhraseQ

    b = analyze_batch([all_pdf["text"].iloc[0]])
    phrase = PhraseQ(
        terms=(b.tok_terms[0], b.tok_terms[1]),
        offsets=(int(b.tok_positions[0]), int(b.tok_positions[1])),
    )
    # the phrase exercises POSITIONS through re-sorted partial-merge blocks
    queries = [TermQ(hot), BoolQ(must=(TermQ(hot), TermQ(mid))), phrase]

    def results():
        s = Searcher(spark, d)
        return [s.search(q, k=10) for q in queries]

    before = results()
    assert len(live_units(d)) == 6  # 3 appends x 2 batches

    rec1 = tiered_merge(spark, d, segs_per_tier=3, max_merge_at_once=3,
                        floor_postings=10)
    assert rec1 is not None and len(rec1["inputs"]) == 3
    u1 = live_units(d)
    assert len(u1) == 4  # 6 - 3 + 1
    for got, want in zip(results(), before):
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True))
    # the merged unit's re-cut blocks INTERLEAVE in gid space with the
    # still-live batches: the audit must accept that layout (it is valid;
    # the reader restores global order)
    report_mid = check_index(spark, d)
    assert report_mid["healthy"], report_mid

    rec2 = tiered_merge(spark, d, segs_per_tier=3, max_merge_at_once=3,
                        floor_postings=10)
    assert rec2 is not None
    u2 = live_units(d)
    assert len(u2) < len(u1)
    for got, want in zip(results(), before):
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True))

    # force a merge whose inputs include merge OUTPUTS (m-units): their
    # re-cut blocks interleave in gid space, exercising the re-sort path
    rec3 = tiered_merge(spark, d, segs_per_tier=2, max_merge_at_once=4,
                        floor_postings=10)
    assert rec3 is not None
    assert any(u.startswith("m") for u in rec3["inputs"]), rec3["inputs"]
    for got, want in zip(results(), before):
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True))

    report = check_index(spark, d)
    assert report["healthy"], report


def test_cli_tiered_merge_parser():
    from lucene_spark.cli import build_parser

    args = build_parser().parse_args(
        ["tiered-merge", "--index-dir", "/tmp/x", "--segs-per-tier", "3"]
    )
    assert args.segs_per_tier == 3 and args.fn.__name__ == "cmd_tiered_merge"
