"""spark-submit entrypoint: index build / merge / search jobs.

Ship the package to a cluster as a zip and drive it with this module
(the IndexFiles/SearchFiles demo pair, lucene/demo/, as cluster jobs):

    python -m lucene_spark.make_pyfiles /tmp/lucene_spark.zip
    spark-submit --master <cluster> --py-files /tmp/lucene_spark.zip \
        cli.py index --input /data/pages --index-dir /data/idx \
        --n-segments 4096 --from-html --merge
    spark-submit ... cli.py search --index-dir /data/idx \
        --query 'merge AND window' --k 10

``--from-html`` runs the html→text extractor as a vectorized pandas UDF and
(optionally, ``--check-extraction``) verifies the per-row invariant that the
extracted text is byte-identical to the shipped ``text`` column.

The job creates its own SparkSession from the submit-provided master/conf —
no hardcoded master, so the same command line works on local[N] and a real
multi-executor cluster.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName(app).getOrCreate()


def _with_extracted_text(df):
    """html -> text as an Arrow-batched pandas UDF (sources/webtext.extract_text)."""
    from pyspark.sql import functions as F, types as T

    from lucene_spark.sources.webtext import extract_text

    extract = F.pandas_udf(lambda html: html.map(extract_text), T.StringType())
    return df.withColumn("text", extract(F.col("html")))


def cmd_index(args) -> int:
    from pyspark.sql import functions as F

    from lucene_spark.operators.indexer import build_index
    from lucene_spark.operators.merge import merge_index

    from lucene_spark.sources.tables import read_pages

    spark = _spark("lucene_spark_index")
    pages = read_pages(spark, args.input)
    if args.from_html:
        pages = _with_extracted_text(pages)
        if args.check_extraction and "text" in read_pages(spark, args.input).columns:
            orig = read_pages(spark, args.input).select(
                args.key_col, F.col("text").alias("text_orig")
            )
            mismatches = (
                pages.select(args.key_col, "text")
                .join(orig, args.key_col)
                .filter(F.col("text") != F.col("text_orig"))
                .count()
            )
            if mismatches:
                print(json.dumps({"error": "extraction mismatch", "rows": mismatches}))
                return 1
    metrics = build_index(
        spark,
        pages,
        args.index_dir,
        key_col=args.key_col,
        text_col="text",
        n_segments=args.n_segments,
        batch_segments=args.batch_segments,
        append=args.append,
    )
    out = {"job": "index", "n_docs_new": metrics["n_docs_new"],
           "wall_sec": round(metrics["wall_sec"], 3)}
    if args.merge:
        rec = merge_index(spark, args.index_dir, salt_docs=args.salt_docs)
        out["merge"] = {"n_hot_terms": rec["n_hot_terms"], "wall_sec": rec["wall_sec"]}
    print(json.dumps(out))
    return 0


def cmd_search(args) -> int:
    from lucene_spark.operators.search import Searcher

    spark = _spark("lucene_spark_search")
    s = Searcher(spark, args.index_dir)
    hits = s.search(args.query, k=args.k)
    print(
        json.dumps(
            {
                "job": "search",
                "query": args.query,
                "hits": [
                    {"gid": int(g), "key": k, "score": float(sc)}
                    for g, k, sc in zip(hits["gid"], hits["key"], hits["score"])
                ],
            }
        )
    )
    return 0


def cmd_delete(args) -> int:
    """Mark docs deleted (live-docs layer); --purge runs a full purge merge
    afterwards so postings reclaim and stats re-derive from survivors."""
    from lucene_spark.operators.indexer import delete_docs
    from lucene_spark.operators.merge import merge_index

    spark = _spark("lucene_spark_delete")
    if (args.gids is None) == (args.query is None):
        print(json.dumps({"error": "exactly one of --gids / --query required"}))
        return 1
    gids = [int(g) for g in args.gids.split(",")] if args.gids else None
    rec = delete_docs(spark, args.index_dir, gids=gids, query=args.query)
    out = {"job": "delete", "n_docs": rec["n_docs"], "path": rec["path"]}
    if args.purge:
        m = merge_index(spark, args.index_dir, purge=True, salt_docs=args.salt_docs)
        out["purge"] = {"n_deleted_purged": m["n_deleted_purged"],
                        "wall_sec": m["wall_sec"]}
    print(json.dumps(out))
    return 0


def cmd_tiered_merge(args) -> int:
    """One incremental tiered-merge step (TieredMergePolicy analog); the
    refresh job a scheduler runs after appends. Exits 0 whether or not a
    merge was due; the JSON reports what happened."""
    from lucene_spark.operators.merge import live_units, tiered_merge

    spark = _spark("lucene_spark_tiered_merge")
    rec = tiered_merge(
        spark, args.index_dir,
        segs_per_tier=args.segs_per_tier,
        max_merge_at_once=args.max_merge_at_once,
        floor_postings=args.floor_postings,
        salt_docs=args.salt_docs,
    )
    out = {"job": "tiered_merge", "merged": rec is not None}
    if rec is not None:
        out.update({"inputs": rec["inputs"], "out": rec["out"],
                    "wall_sec": rec["wall_sec"]})
    out["live_units"] = [u["uid"] for u in live_units(args.index_dir)]
    print(json.dumps(out))
    return 0


def cmd_check(args) -> int:
    """Integrity audit (CheckIndex analog) — exits nonzero on violations."""
    from lucene_spark.operators.check import check_index

    spark = _spark("lucene_spark_check")
    report = check_index(spark, args.index_dir)
    print(json.dumps({"job": "check", **report}))
    return 0 if report["healthy"] else 1


def cmd_generate(args) -> int:
    """Deterministic synthetic pages corpus (benchmark content source analog)."""
    from lucene_spark.sources.webtext import pages_df

    spark = _spark("lucene_spark_generate")
    pages_df(spark, args.n_docs, seed=args.seed, n_partitions=args.partitions).write.mode(
        "overwrite"
    ).parquet(args.output)
    print(json.dumps({"job": "generate", "n_docs": args.n_docs, "output": args.output}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lucene_spark.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="build (or resume/append) an index")
    pi.add_argument(
        "--input", required=True,
        help="pages source: a Parquet directory path, or a catalog table "
             "identifier like catalog.db.pages (Iceberg on a cluster with "
             "the Iceberg runtime registered)",
    )
    pi.add_argument("--index-dir", required=True)
    pi.add_argument("--key-col", default="url")
    pi.add_argument("--n-segments", type=int, default=64)
    pi.add_argument("--batch-segments", type=int, default=None)
    pi.add_argument("--from-html", action="store_true")
    pi.add_argument("--check-extraction", action="store_true")
    pi.add_argument("--append", action="store_true")
    pi.add_argument("--merge", action="store_true")
    pi.add_argument("--salt-docs", type=int, default=1_000_000)
    pi.set_defaults(fn=cmd_index)

    ps = sub.add_parser("search", help="top-k BM25 search")
    ps.add_argument("--index-dir", required=True)
    ps.add_argument("--query", required=True)
    ps.add_argument("--k", type=int, default=10)
    ps.set_defaults(fn=cmd_search)

    pd_ = sub.add_parser("delete", help="mark docs deleted (optionally purge)")
    pd_.add_argument("--index-dir", required=True)
    pd_.add_argument("--gids", default=None, help="comma-separated docIDs")
    pd_.add_argument("--query", default=None, help="delete-by-query")
    pd_.add_argument("--purge", action="store_true")
    pd_.add_argument("--salt-docs", type=int, default=1_000_000)
    pd_.set_defaults(fn=cmd_delete)

    pt = sub.add_parser("tiered-merge", help="one incremental tiered-merge step")
    pt.add_argument("--index-dir", required=True)
    pt.add_argument("--segs-per-tier", type=int, default=10)
    pt.add_argument("--max-merge-at-once", type=int, default=10)
    pt.add_argument("--floor-postings", type=int, default=100_000)
    pt.add_argument("--salt-docs", type=int, default=1_000_000)
    pt.set_defaults(fn=cmd_tiered_merge)

    pc = sub.add_parser("check", help="index integrity audit")
    pc.add_argument("--index-dir", required=True)
    pc.set_defaults(fn=cmd_check)

    pg = sub.add_parser("generate", help="write a synthetic pages corpus")
    pg.add_argument("--output", required=True)
    pg.add_argument("--n-docs", type=int, required=True)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--partitions", type=int, default=64)
    pg.set_defaults(fn=cmd_generate)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
