"""Spell suggestion (lucene/suggest + DirectSpellChecker analog).

DirectSpellChecker proposes corrections by intersecting a Levenshtein
automaton with the term dictionary and ranking by edit distance then
docFreq (``lucene/suggest/.../DirectSpellChecker.java``). Spark-first:
a JVM-side ``levenshtein`` filter over the sorted terms table, ranked
(distance asc, doc_freq desc, term asc) — deterministic, and at scale
the filter runs as one map over the (small, per-index) terms table.
"""

from __future__ import annotations

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
