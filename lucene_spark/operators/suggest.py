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
    ``min over L in [len(q)-d, len(q)+d] of dist(q, akey[:L])`` — a
    prefix longer than ``len(q)+d`` can never be within ``d``. With
    ``transpositions=False`` the automaton intersection becomes ``2d+1``
    JVM-side ``levenshtein`` expressions over ``substring(akey)``;
    nothing leaves the JVM. With ``transpositions=True`` (the reference
    default: a swap costs 1 — the OSA form FuzzyQuery's
    LevenshteinAutomata pin, ``functions/editdist.py``) Spark has no
    built-in, so the distance runs as ONE Arrow-batched pandas_udf over
    the shared vectorized OSA DP (whose final row already holds the
    distance to every prefix — one masked min, no extra DP passes). In
    both paths a pushed-down StartsWith on the pinned non-fuzzy prefix
    prunes the sorted table's row groups first.
    """
    from ..functions.analysis import analyze_batch

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
    if transpositions:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        d, qq = int(max_edits), q

        @pandas_udf("long")
        def _osa_pref(akeys: pd.Series) -> pd.Series:
            from ..functions.editdist import osa_prefix_min

            return pd.Series(
                osa_prefix_min(akeys.fillna("").tolist(), qq, d)
            )

        keep = _osa_pref(F.col("akey")) <= max_edits
    else:
        lens = range(max(1, len(q) - max_edits), len(q) + max_edits + 1)
        dists = [
            F.levenshtein(F.substring("akey", 1, L), F.lit(q)) for L in lens
        ]
        keep = (
            dists[0] if len(dists) == 1 else F.least(*dists)
        ) <= max_edits
    per_surface = (
        sug.filter(keep)
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


# ------------------------------------------------------- FreeTextSuggester

FREE_TEXT_ALPHA = 0.4  # FreeTextSuggester.ALPHA (stupid backoff)


def build_free_text(
    spark,
    docs: DataFrame,
    out_path: str,
    *,
    grams: int = 3,
    text_col: str = "text",
    key_partitions: int = 1,
) -> None:
    """Build the FreeTextSuggester n-gram language model
    (``suggest/.../analyzing/FreeTextSuggester.java:176-360`` build: the
    analyzer wrapped in a ShingleFilter emits every 1..grams-gram, and the
    'index' stores each gram with its total occurrence count as weight).

    Spark-first: grams come straight off the token array with
    ``transform(sequence(...))`` — one JVM-side projection, no UDF — and
    the model is ONE groupBy(gram) count. The table is range-sorted by
    gram so a lookup's prefix scan prunes to the row groups covering the
    context (the FST-arc analog used by every suggester table here). The
    suggester's analyzer is a plain whitespace+lowercase chain with NO
    stop filter (suggesters keep function words; Lucene passes a
    dedicated analyzer too).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")

    def _gram_col(n: int):
        # sequence(1, x) DESCENDS for x < 1, so gate on having >= n tokens
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    gram_cols = [_gram_col(n) for n in range(1, grams + 1)]
    exploded = docs.select(
        F.explode(F.flatten(F.array(*gram_cols))).alias("gram")
    )
    counts = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    counts = counts.withColumn(
        "n", F.size(F.split(F.col("gram"), " "))
    )
    (
        counts.repartitionByRange(key_partitions, "gram")
        .sortWithinPartitions("gram")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def free_text_tokens(key: str, grams: int) -> "list[str | None]":
    """lastTokens[] per FreeTextSuggester.lookup:433-516 — index ``o``
    holds the last ``o+1``-gram of the input (context + partial last
    token). A key ending in whitespace "upgrades" every token one order
    (trailing separator appended) so "foo " predicts bigrams starting
    with foo, never unigrams; the unigram slot becomes the empty string,
    which the consult loop skips ("don't make unigram predictions from
    empty string")."""
    toks = [t for t in key.lower().split(" ") if t]
    if not toks:
        raise ValueError("no tokens produced from key")
    last: "list[str | None]" = [None] * grams
    for o in range(grams):
        if o + 1 <= len(toks):
            last[o] = " ".join(toks[-(o + 1):])
    if key.endswith(" "):
        for o in range(grams - 1, 0, -1):
            if last[o - 1] is not None:
                last[o] = last[o - 1] + " "
        last[0] = ""
    return last


def free_text_context(token: str) -> "str | None":
    """The context gram whose count is the score denominator: everything
    before the token's last separator (FreeTextSuggester.java:575-590);
    None means no separator — the unigram model, denominator totTokens."""
    if token.endswith(" "):
        return token[:-1]
    if " " in token:
        return token.rsplit(" ", 1)[0]
    return None


def free_text_lookup(
    spark,
    path: str,
    key: str,
    n: int = 5,
    *,
    grams: int = 3,
) -> DataFrame:
    """FreeTextSuggester.lookup (FreeTextSuggester.java:433-720): predict
    or complete the last token under the stupid-backoff model.

    Per order, highest first: the last ``order`` context tokens (plus the
    partial last token, or a trailing separator if the key ends with
    whitespace) form the prefix; completions within that model score
    ``backoff * count(gram) / count(context)`` (context count from the
    next-lower-order model, totTokens for unigrams — java:575-590).
    ``backoff`` multiplies by ALPHA after each consulted order, hit or
    miss (java:566,699); orders the input is too short for neither
    consult nor decay. A completed last token is suggested only by the
    highest order that saw it (the ``seen`` set, java:531,681-685), each
    order contributes at most ``n`` suggestions (the TopNSearcher topN),
    and the final ranking is score desc, gram text asc (java:704-720).
    Scores here are the raw double ``backoff*cnt/ctx``; the reference
    scales by Long.MAX_VALUE and truncates to long — order-identical.

    The whole lookup is ONE lazy Spark plan, no driver collects: each
    consulted order is a pushed-down (n == order+1 AND startswith) scan
    of the range-sorted gram table feeding a distributed
    TakeOrderedAndProject top-n, the seen-set dedup is a broadcast
    anti-join against the higher orders' results, and the context count
    joins in as a broadcast scalar. Only row groups whose gram range
    covers the prefix are read, however large the model — the FST-arc
    pruning analog.
    """
    gdf = spark.read.parquet(path)
    last = free_text_tokens(key, grams)

    backoff = 1.0
    seen: "DataFrame | None" = None  # lastwords claimed by higher orders
    branches: "list[DataFrame]" = []
    for order in range(grams - 1, -1, -1):
        token = last[order]
        if token is None or (token == "" and key):
            continue  # input too short for this order: no consult, no decay
        cand = gdf.where(
            (F.col("n") == order + 1) & F.col("gram").startswith(token)
        ).select(
            "gram", "cnt",
            F.element_at(F.split(F.col("gram"), " "), -1).alias("lastword"),
        )
        if seen is not None:
            cand = cand.join(F.broadcast(seen), "lastword", "left_anti")
        res = cand.orderBy(F.desc("cnt"), F.asc("gram")).limit(n)
        context = free_text_context(token)
        if context is not None:
            ctx = gdf.where(
                (F.col("n") == order) & (F.col("gram") == context)
            ).select(F.col("cnt").alias("ctx"))
        else:
            ctx = gdf.where(F.col("n") == 1).agg(F.sum("cnt").alias("ctx"))
        # inner cross join: a missing context (0 rows) empties the branch,
        # matching the reference's backoff-and-continue on unseen context
        scored = res.crossJoin(F.broadcast(ctx)).select(
            "gram",
            (F.lit(backoff) * F.col("cnt") / F.col("ctx")).alias("score"),
            "lastword",
        )
        branches.append(scored)
        claimed = res.select("lastword")
        seen = claimed if seen is None else seen.union(claimed)
        backoff *= FREE_TEXT_ALPHA
    if not branches:
        return spark.createDataFrame([], schema="gram string, score double")
    allres = branches[0]
    for b in branches[1:]:
        allres = allres.union(b)
    return (
        allres.orderBy(F.desc("score"), F.asc("gram"))
        .limit(n)
        .select("gram", "score")
    )


# -------------------------------------------------- AnalyzingInfixSuggester

def build_infix_suggester(
    entries: DataFrame,
    out_path: str,
    *,
    key_partitions: int = 1,
) -> None:
    """Build the AnalyzingInfixSuggester tables
    (``suggest/.../analyzing/AnalyzingInfixSuggester.java:380-470``: each
    suggestion is indexed like a document — its analyzed tokens are the
    searchable field, ranked by a weight doc value).

    Spark-first layout, two parquet tables under ``out_path``:

    - ``surfaces``: (surface, weight, toks) — duplicate surfaces keep
      the max weight (the reference's update() semantics, deterministic
      analog of last-writer);
    - ``tokens``: distinct (tok, surface), RANGE-SORTED by tok — the
      inverted index. An exact query token is a pushed-down equality
      seek; the trailing prefix token a pushed-down StartsWith (the
      reference gets the same via EdgeNGrams under minPrefixChars and
      PrefixQuery above it, java:123-152 — both are term-dictionary
      seeks, as here via parquet min/max pruning).

    The analyzer is lowercase-whitespace with NO stop filter (infix
    suggesters keep function words)."""
    toks = F.filter(
        F.split(F.lower(F.col("surface")), " "), lambda t: t != ""
    )
    dedup = (
        entries.select(
            F.col("surface").cast("string").alias("surface"),
            F.col("weight").cast("long").alias("weight"),
        )
        .groupBy("surface")
        .agg(F.max("weight").alias("weight"))
        .withColumn("toks", toks)
        .where(F.size("toks") > 0)
    )
    (
        dedup.repartitionByRange(key_partitions, "surface")
        .sortWithinPartitions("surface")
        .write.mode("overwrite")
        .parquet(out_path + "/surfaces")
    )
    tok_rows = dedup.select(
        F.explode("toks").alias("tok"), "surface"
    ).distinct()
    (
        tok_rows.repartitionByRange(key_partitions, "tok")
        .sortWithinPartitions("tok", "surface")
        .write.mode("overwrite")
        .parquet(out_path + "/tokens")
    )


def infix_lookup(
    spark,
    path: str,
    key: str,
    n: int = 5,
    *,
    all_terms_required: bool = True,
    do_highlight: bool = True,
) -> DataFrame:
    """AnalyzingInfixSuggester.lookup
    (AnalyzingInfixSuggester.java:626-760): every key token except the
    last must match a token ANYWHERE in the suggestion (exact term
    query); the last token matches as a prefix — unless the key ends
    with whitespace, which makes it exact too (java:672-689). Tokens
    combine MUST when ``all_terms_required`` else SHOULD, results rank
    by weight desc (the reference sorts only by weight, java:723-729;
    ties pinned surface asc here), and highlighting wraps whole matched
    tokens in ``<b>..</b>`` and the matched PREFIX of the last token
    (java:849-934; surfaces here reconstruct single-spaced).

    One lazy plan: per-token pushed-down seeks into the tok-sorted
    inverted table, semi-join chained (AND) or union-distinct (OR) into
    the surfaces table, distributed top-n. No driver collects.
    """
    toks = [t for t in key.lower().split(" ") if t]
    if not toks:
        return spark.createDataFrame(
            [], schema="surface string, weight long, highlighted string"
        )
    ended = key.endswith(" ")
    exact = toks if ended else toks[:-1]
    prefix = None if ended else toks[-1]

    tok_df = spark.read.parquet(path + "/tokens")
    sels = [
        tok_df.where(F.col("tok") == t).select("surface") for t in exact
    ]
    if prefix is not None:
        sels.append(
            tok_df.where(F.col("tok").startswith(prefix))
            .select("surface").distinct()
        )
    if all_terms_required:
        cand = sels[0]
        for s in sels[1:]:
            cand = cand.join(s, "surface", "left_semi")
    else:
        cand = sels[0]
        for s in sels[1:]:
            cand = cand.union(s)
        cand = cand.distinct()

    surf = spark.read.parquet(path + "/surfaces")
    res = surf.join(cand, "surface", "left_semi")

    if do_highlight:
        def hl(tok):
            whole = tok.isin(list(exact)) if exact else F.lit(False)
            out = F.when(
                whole, F.concat(F.lit("<b>"), tok, F.lit("</b>"))
            )
            if prefix is not None:
                pref = tok.startswith(prefix)
                out = out.when(pref, F.concat(
                    F.lit("<b>" + prefix + "</b>"),
                    tok.substr(F.lit(len(prefix) + 1), F.length(tok)),
                ))
            return out.otherwise(tok)

        res = res.withColumn(
            "highlighted",
            F.array_join(F.transform(F.col("toks"), hl), " "),
        )
    else:
        res = res.withColumn("highlighted", F.col("surface"))
    return (
        res.orderBy(F.desc("weight"), F.asc("surface"))
        .limit(n)
        .select("surface", "weight", "highlighted")
    )
