"""Suggesters (lucene/suggest analogs).

- ``spell_suggest``: DirectSpellChecker — intersect a Levenshtein
  automaton with the term dictionary, rank by edit distance then docFreq
  (``lucene/suggest/.../DirectSpellChecker.java``). Spark-first: a
  JVM-side ``levenshtein`` filter over the sorted terms table.
- ``complete``: bare prefix autocomplete over the term dictionary.
- ``build_analyzing_suggester`` / ``analyzing_lookup``: the
  AnalyzingSuggester
  (``lucene/suggest/.../analyzing/AnalyzingSuggester.java``) — surface
  forms are ANALYZED at build time (tokenize / lowercase / stop-filter)
  and completion matches on the analyzed form, so a lookup for
  "the mer" completes surfaces whose analyzed text starts with "mer".
  Lucene compiles analyzed->(weight, surface) into a weighted FST; the
  Spark-first analog is this repo's FST stand-in everywhere else too — a
  parquet table RANGE-SORTED by the analyzed key, so a prefix lookup is
  a pushed-down StartsWith over parquet min/max-pruned row groups, and
  the top-n is a per-key ranked scan. At 100 TB the build is one
  analyze projection + one shuffle (dedup groupBy) + one range
  repartition; lookups touch only the row groups covering the analyzed
  prefix.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def complete(searcher, prefix: str, n: int = 5) -> DataFrame:
    """Prefix autocomplete: top completions by collection frequency
    (AnalyzingSuggester-style popularity ranking over the term dict)."""
    tdf = searcher.terms_table()
    return (
        tdf.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("total_term_freq"), F.asc("term"))
        .limit(n)
        .select("term", F.col("total_term_freq").cast("long").alias("weight"))
    )


def build_analyzing_suggester(
    entries: DataFrame,
    out_path: str,
    *,
    preserve_sep: bool = True,
    max_surface_per_key: int = 256,
    key_partitions: int = 1,
) -> None:
    """Build an AnalyzingSuggester table from (surface, weight) entries.

    Mirrors AnalyzingSuggester's build
    (``suggest/.../analyzing/AnalyzingSuggester.java:115-142`` options,
    build loop ~360-470): each surface form is analyzed with the engine's
    StandardAnalyzer chain; with ``preserve_sep`` (Lucene PRESERVE_SEP,
    default on) tokens join with a separator so token boundaries survive
    in the key, otherwise they concatenate. Exact (analyzed, surface)
    duplicates dedup to their max weight, and each analyzed form keeps at
    most ``max_surface_per_key`` surfaces by weight
    (maxSurfaceFormsPerAnalyzedForm, default 256). Surfaces whose
    analysis yields no tokens (all stopwords) are unreachable and drop,
    as in the FST where the empty path is not stored.

    The output parquet is range-sorted by analyzed key — the FST analog:
    prefix lookups prune by parquet min/max exactly as FST arcs prune by
    byte prefix.
    """
    from pyspark.sql.window import Window

    from ..functions.analysis import analyze_batch

    sep = " " if preserve_sep else ""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ab = analyze_batch(pdf["surface"])
            toks = ab.tok_terms_pa.to_pandas()
            grouped = toks.groupby(ab.tok_doc_idx, sort=False).agg(sep.join)
            keys = pd.Series([""] * len(pdf))
            keys.iloc[grouped.index] = grouped.to_numpy()
            out = pd.DataFrame({
                "akey": keys.to_numpy(),
                "surface": pdf["surface"].to_numpy(),
                "weight": pdf["weight"].to_numpy("int64"),
            })
            yield out[out["akey"] != ""]

    analyzed = entries.select(
        F.col("surface").cast("string").alias("surface"),
        F.col("weight").cast("long").alias("weight"),
    ).mapInPandas(kernel, schema="akey string, surface string, weight long")

    dedup = analyzed.groupBy("akey", "surface").agg(
        F.max("weight").alias("weight")
    )
    w = Window.partitionBy("akey").orderBy(
        F.desc("weight"), F.asc("surface")
    )
    kept = (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_surface_per_key)
        .drop("rn")
    )
    (
        kept.repartitionByRange(key_partitions, "akey")
        .sortWithinPartitions("akey")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def analyzing_lookup(
    spark,
    path: str,
    key: str,
    n: int = 5,
    *,
    exact_first: bool = True,
    preserve_sep: bool = True,
) -> DataFrame:
    """Look up top-n suggestions for ``key`` from a built suggester table.

    Semantics per AnalyzingSuggester.lookup (the TopNSearcher pass at
    ``AnalyzingSuggester.java:500-640``): the key is analyzed with the
    SAME chain as the build, completions are every stored entry whose
    analyzed form starts with the analyzed key, surface forms dedup (the
    searcher's ``seen`` set), and with ``exact_first`` the entry whose
    surface equals the raw key verbatim (``sameSurfaceForm``) ranks
    before the weight-ordered rest. Ties inside a weight rank break by
    surface ascending (Lucene enumerates FST byte order).

    Returns (surface string, weight long). The analyzed-prefix filter is
    a Catalyst StartsWith pushed into the parquet scan of the
    range-sorted suggester table — only row groups whose [min, max] akey
    interval covers the prefix are read.
    """
    from ..functions.analysis import analyze_batch

    sep = " " if preserve_sep else ""
    ab = analyze_batch([key])
    toks = ab.tok_terms_pa.to_pylist()
    if not toks:
        # the whole key analyzed away (all stopwords) -> no prefix to
        # complete; Lucene returns an empty list for an empty automaton
        return spark.createDataFrame([], schema="surface string, weight long")
    prefix = sep.join(toks)

    sug = spark.read.parquet(path).filter(F.col("akey").startswith(prefix))
    per_surface = sug.groupBy("surface").agg(F.max("weight").alias("weight"))
    exact = (
        (F.col("surface") == F.lit(key)) if exact_first else F.lit(False)
    )
    return (
        per_surface.orderBy(
            exact.desc(), F.desc("weight"), F.asc("surface")
        )
        .limit(n)
        .select("surface", "weight")
    )


def fuzzy_lookup(
    spark,
    path: str,
    key: str,
    n: int = 5,
    *,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    transpositions: bool = False,
    exact_first: bool = True,
    preserve_sep: bool = True,
) -> DataFrame:
    """FuzzySuggester lookup over a built analyzing-suggester table.

    FuzzySuggester (``suggest/.../analyzing/FuzzySuggester.java:44-91``)
    fuzzes the analyzed lookup automaton: an entry completes when SOME
    prefix of its analyzed form is within ``max_edits`` Levenshtein
    edits of the analyzed key, the first ``non_fuzzy_prefix`` characters
    must match exactly, and keys shorter than ``min_fuzzy_length``
    analyzed characters match exactly (no fuzz). Defaults mirror the
    reference (1 edit / 1-char pinned prefix / 3-char minimum).

    Spark-first: the prefix edit distance to the analyzed key ``q`` is
    ``min over L in [len(q)-d, len(q)+d] of lev(q, akey[:L])`` — a
    prefix longer than ``len(q)+d`` can never be within ``d`` — so the
    automaton intersection becomes ``2d+1`` JVM-side ``levenshtein``
    expressions over ``substring(akey)``, after a pushed-down StartsWith
    on the pinned non-fuzzy prefix prunes the sorted table's row groups.
    Nothing leaves the JVM.

    Deviation: the reference defaults ``transpositions=true``
    (Damerau — a swap costs 1); Spark's ``levenshtein`` is classic (a
    swap costs 2), so only ``transpositions=False`` is supported and the
    reference default raises NotImplementedError.
    """
    from ..functions.analysis import analyze_batch

    if transpositions:
        raise NotImplementedError(
            "transpositions=True (Damerau distance) is not expressible "
            "with Spark's levenshtein; pass transpositions=False"
        )
    sep = " " if preserve_sep else ""
    ab = analyze_batch([key])
    toks = ab.tok_terms_pa.to_pylist()
    if not toks:
        return spark.createDataFrame([], schema="surface string, weight long")
    q = sep.join(toks)

    if len(q) < min_fuzzy_length or max_edits == 0:
        # below the fuzz threshold the automaton is the exact key
        return analyzing_lookup(
            spark, path, key, n,
            exact_first=exact_first, preserve_sep=preserve_sep,
        )

    sug = spark.read.parquet(path)
    if non_fuzzy_prefix > 0:
        sug = sug.filter(
            F.col("akey").startswith(q[: non_fuzzy_prefix])
        )
    lens = range(max(1, len(q) - max_edits), len(q) + max_edits + 1)
    dists = [
        F.levenshtein(F.substring("akey", 1, L), F.lit(q)) for L in lens
    ]
    dist = dists[0] if len(dists) == 1 else F.least(*dists)
    per_surface = (
        sug.filter(dist <= max_edits)
        .groupBy("surface")
        .agg(F.max("weight").alias("weight"))
    )
    exact = (
        (F.col("surface") == F.lit(key)) if exact_first else F.lit(False)
    )
    return (
        per_surface.orderBy(
            exact.desc(), F.desc("weight"), F.asc("surface")
        )
        .limit(n)
        .select("surface", "weight")
    )


def spell_suggest(
    searcher,
    word: str,
    *,
    max_edits: int = 2,
    n: int = 5,
    min_doc_freq: int = 1,
) -> DataFrame:
    """Top-n correction candidates for ``word``: (term, distance, doc_freq)."""
    tdf = searcher.terms_table()
    return (
        tdf.withColumn("distance", F.levenshtein(F.col("term"), F.lit(word)))
        .filter(
            (F.col("distance") <= max_edits)
            & (F.col("distance") > 0)  # the word itself is not a suggestion
            & (F.col("doc_freq") >= min_doc_freq)
        )
        .orderBy(F.asc("distance"), F.desc("doc_freq"), F.asc("term"))
        .limit(n)
        .select("term", F.col("distance").cast("int").alias("distance"),
                F.col("doc_freq").cast("long").alias("doc_freq"))
    )
