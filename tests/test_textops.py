"""Targeted textops behavior beyond the driver-contract oracle gate:
LSH/IVF recall properties and dedup semantics the oracles can't express."""

import numpy as np
import pytest

from lucene_spark.operators import textops

SF = "/root/testdata/sf0.01"


def _brute_topk(spark, k=50):
    return [
        int(r["vec_id"])
        for r in textops.ann_cosine_topk(spark, SF, query_vec_id=0, k=k).collect()
    ]


def test_ivf_full_probe_is_exact(spark):
    exact = _brute_topk(spark, k=10)
    ivf = [
        int(r["vec_id"])
        for r in textops.ann_ivf_topk(spark, SF, query_vec_id=0, k=10,
                                      n_cells=16, n_probe=16).collect()
    ]
    assert ivf == exact


def test_ivf_partial_probe_recall(spark):
    """Probing 4/16 cells must still find most of the true top-10."""
    exact = set(_brute_topk(spark, k=10))
    ivf = {
        int(r["vec_id"])
        for r in textops.ann_ivf_topk(spark, SF, query_vec_id=0, k=10,
                                      n_cells=16, n_probe=4).collect()
    }
    assert len(ivf & exact) >= 5
    # every IVF result is a genuine neighbor (subset of a deeper exact list)
    assert ivf <= set(_brute_topk(spark, k=500))


def test_lsh_results_are_true_cosines(spark):
    """LSH may miss neighbors but never fabricates scores: each returned
    (vec_id, cos) appears with the same cosine in the exact ranking."""
    exact = {
        int(r["vec_id"]): r["cos"]
        for r in textops.ann_cosine_topk(spark, SF, query_vec_id=0, k=499).collect()
    }
    for r in textops.ann_lsh_topk(spark, SF, query_vec_id=0, k=10).collect():
        assert exact[int(r["vec_id"])] == r["cos"]


def test_minhash_lsh_catches_high_jaccard_pairs(spark):
    """Every pair with exact 3-gram Jaccard >= 0.9 must surface as an LSH
    candidate (banded MinHash with 4 bands of 4 rows is near-certain there)."""
    true_pairs = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in textops.ngram_jaccard_pairs(spark, SF, threshold=0.9).collect()
    }
    cand = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in textops.minhash_lsh_pairs(spark, SF).collect()
    }
    assert true_pairs, "corpus should contain high-jaccard near-dups"
    missed = true_pairs - cand
    assert len(missed) <= max(1, len(true_pairs) // 10), missed


def test_lsh_template_family_is_linear(spark, tmp_path_factory):
    """A 1k-doc template family (near-identical, NOT byte-identical docs
    sharing every band key) must produce O(n) star pairs, not an O(n^2)
    clique — the degenerate-band-bucket cap — and still collapse to ONE
    dedup cluster."""
    import os

    import pandas as pd

    d = str(tmp_path_factory.mktemp("tmpl"))
    base = " ".join(f"tw{i}" for i in range(60))
    n = 1000
    rows = [(i, base + f" uniq{i}") for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    pairs = textops.minhash_lsh_pairs(spark, d, bands=4).collect()
    # star form: <= (bands * n) pre-distinct, so far under the ~n^2/2 clique
    assert 0 < len(pairs) <= 4 * n, len(pairs)
    # the family still collapses into one component (min-doc canonical)
    clusters = textops.dedup_clusters(spark, d, bands=4).toPandas()
    fam = clusters[clusters["doc_id"] < n]
    assert (fam["cluster_id"] == 0).all()


def test_dedup_exact_flags_injected_duplicates(spark, tmp_path):
    docs = textops.docs(spark, SF).limit(20)
    dup = docs.limit(5).selectExpr("doc_id + 100000 AS doc_id", "text", "lang",
                                   "source", "n_chars")
    both = docs.unionByName(dup)
    out = str(tmp_path / "sf")
    both.coalesce(1).write.parquet(out + "/documents.parquet")
    res = textops.dedup_exact(spark, out).collect()
    flagged = {int(r["doc_id"]) for r in res if r["is_duplicate"]}
    assert flagged == {100000 + int(r["doc_id"]) for r in docs.limit(5).collect()}


def test_cross_doc_dup_ngrams_semantics(spark, tmp_path):
    """Hand-built corpus: doc 0 and doc 1 share their full text (every gram
    duplicated), doc 2 is unique (no gram duplicated), doc 3 is too short
    for a 5-gram (zero grams, frac 0.0)."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "one two three four five six seven", "en", "s", 1),
        (3, "tiny doc", "en", "s", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")
    out = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    res = {int(r["doc_id"]): r for r in
           textops.cross_doc_dup_ngrams(spark, out, k=5).collect()}
    assert res[0]["n_grams"] == 2 and res[0]["cross_dup_frac"] == 1.0
    assert res[1]["cross_dup_frac"] == 1.0
    assert res[2]["n_grams"] == 3 and res[2]["cross_dup_frac"] == 0.0
    assert res[3]["n_grams"] == 0 and res[3]["cross_dup_frac"] == 0.0


def test_degenerate_inputs_no_ansi_crash(spark, tmp_path):
    """Zero vectors and zero-token docs must not raise ANSI divide-by-zero
    (Spark 4 defaults ANSI on): NULL cosines sort after real scores, and a
    token-less doc language-ids to the first language with score 0.0."""
    import numpy as np

    vecs = [(0, [1.0, 0.0, 2.0]), (1, [0.0, 0.0, 0.0]), (2, [2.0, 0.0, 4.0])]
    out = str(tmp_path / "sf")
    spark.createDataFrame(vecs, "vec_id long, embedding array<double>") \
        .coalesce(1).write.parquet(out + "/embeddings.parquet")
    spark.createDataFrame(
        [(0, " ", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.parquet(out + "/documents.parquet")

    top = textops.ann_cosine_topk(spark, out, query_vec_id=0, k=3).collect()
    assert [int(r["vec_id"]) for r in top] == [2, 1]  # zero vec last, NULL cos
    assert abs(float(top[0]["cos"]) - 1.0) < 1e-12 and top[1]["cos"] is None

    lid = textops.lang_id(spark, out).collect()
    assert len(lid) == 1 and float(lid[0]["lang_score"]) == 0.0


def test_dedup_keep_survivors(spark, tmp_path):
    """Injected exact duplicates collapse to the min-doc_id survivor with
    the right represented count; unique docs survive representing only
    themselves."""
    docs = textops.docs(spark, SF).limit(10)
    dup = docs.limit(3).selectExpr(
        "doc_id + 100000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    out = str(tmp_path / "sf")
    docs.unionByName(dup).coalesce(1).write.parquet(out + "/documents.parquet")
    res = {int(r["doc_id"]): int(r["n_represented"])
           for r in textops.dedup_keep(spark, out).collect()}
    originals = [int(r["doc_id"]) for r in docs.collect()]
    assert all(100000 + d not in res for d in originals[:3])  # dups dropped
    for d in originals[:3]:
        assert res[d] >= 2  # survivor represents itself + its duplicate
    assert sum(res.values()) == 13  # every doc represented exactly once


def test_quality_filter_empty_doc_parity(spark, tmp_path):
    """A whitespace-only doc (zero tokens) must appear in BOTH engines'
    quality_filter output with keep=false and auditable reasons — the
    Spark op emits every doc, so the oracle must too."""
    import duckdb
    import pandas as pd
    from lucene_spark.plans import oracle_textops as otx

    rows = [
        (0, "   ", "en", "s", 3),                      # zero tokens
        (1, "the " * 15 + "word " * 15, "en", "s", 1),  # 30 tokens: len boundary
        (2, "alpha beta gamma", "en", "s", 1),          # short, no stopwords
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(out + "/documents.parquet")

    sdf = (
        textops.quality_filter(spark, out)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    odf = con.sql(otx.quality_filter_sql()).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sdf[sorted(sdf.columns)], odf[sorted(odf.columns)], check_dtype=False
    )
    # the text_stats oracle must also emit the zero-token doc
    stdf = con.sql(otx.text_stats_sql()).df()
    assert len(stdf) == 3 and int(stdf[stdf.doc_id == 0].n_tokens.iloc[0]) == 0

    by_id = {int(r["doc_id"]): r for _, r in sdf.iterrows()}
    assert not by_id[0]["keep"] and not by_id[0]["len_ok"] and not by_id[0]["tok_len_ok"]
    assert by_id[1]["len_ok"]          # exactly min_tokens=30 is inclusive
    assert by_id[1]["stop_ok"]         # 50% stopwords
    assert not by_id[2]["keep"] and not by_id[2]["stop_ok"]


def test_dedup_clusters_chain_transitivity(spark, tmp_path_factory):
    """A-B and B-C are near-dup pairs but A-C share nothing directly: the
    connected component must still collapse to one cluster — this takes >1
    label-propagation round, exercising the iterative path (near-clique
    corpora converge in one)."""
    import os

    from lucene_spark.operators import textops

    d = str(tmp_path_factory.mktemp("chain"))
    common1 = " ".join(f"ca{i}" for i in range(40))
    common2 = " ".join(f"cb{i}" for i in range(40))
    rows = [
        (0, "pada0 pada1 " + common1),               # A: shares common1 with B
        (1, common1 + " " + common2),                # B: bridges A and C
        (2, common2 + " padc0 padc1"),               # C: shares common2 with B
        (3, "totally different words only here once "
            + " ".join(f"w{i}" for i in range(20))),
    ]
    pdf = __import__("pandas").DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = textops.dedup_clusters(spark, d, bands=16).toPandas().set_index("doc_id")
    # verify the premise: LSH linked A-B and B-C but not A-C directly
    # (A and C share ZERO shingles, so no direct edge can exist)
    pairs = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in textops.minhash_lsh_pairs(spark, d, bands=16).collect()
    }
    assert (0, 1) in pairs and (1, 2) in pairs, pairs
    assert (0, 2) not in pairs, "test premise: no direct A-C edge"
    assert int(out.loc[0, "cluster_id"]) == 0
    assert int(out.loc[1, "cluster_id"]) == 0
    assert int(out.loc[2, "cluster_id"]) == 0  # needs 2 propagation rounds
    assert int(out.loc[3, "cluster_id"]) == 3 and not bool(out.loc[3, "is_duplicate"])


def test_connected_components_long_chain_log_rounds(spark):
    """A 400-node path graph must converge well inside O(log n) rounds —
    one-hop label propagation alone would need ~400; pointer doubling
    makes 12 plenty. Labels must all collapse to the chain minimum."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = 400
    e = pd.DataFrame({"a": range(n - 1), "b": range(1, n)})
    edges = spark.createDataFrame(e)
    edges = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    labels = textops.connected_components(edges, nodes, max_iters=12).toPandas()
    assert (labels["label"] == 0).all()
    assert len(labels) == n


# ----------------------------------------------------- filtered KNN (Lucene)


def _exact_filtered(spark, label, k=10):
    from pyspark.sql import functions as F

    return [
        (int(r["vec_id"]), r["cos"])
        for r in textops.knn_filtered_topk(
            spark, SF, query_vec_id=0, k=k,
            filter_pred=F.col("label") == label,
            exact_mult=10**9,  # force the exact-over-filter branch
        ).collect()
    ]


def test_knn_filter_respected(spark):
    """Every hit satisfies the metadata filter; ranking is the exact
    filtered cosine order."""
    from pyspark.sql import functions as F

    got = _exact_filtered(spark, label=3)
    e = textops.embeddings(spark, SF)
    allowed = {int(r["vec_id"]) for r in
               e.filter(F.col("label") == 3).select("vec_id").collect()}
    assert len(got) == 10
    assert all(v in allowed for v, _ in got)
    assert [c for _, c in got] == sorted((c for _, c in got), reverse=True)


def test_knn_probe_fallback_fills_k(spark):
    """n_probe=1 over ~50 filtered vectors leaves < k candidates in the
    probed cell, so the visitedLimit-style fallback must kick in and return
    exactly the exact-over-filter answer (AbstractKnnVectorQuery falls back
    to exact search when the approximate pass can't meet the budget)."""
    from pyspark.sql import functions as F

    got = [
        (int(r["vec_id"]), r["cos"])
        for r in textops.knn_filtered_topk(
            spark, SF, query_vec_id=0, k=25,
            filter_pred=F.col("label") == 3,
            exact_mult=0, n_cells=16, n_probe=1,
        ).collect()
    ]
    assert got == _exact_filtered(spark, label=3, k=25)


def test_knn_approx_results_are_true_filtered_cosines(spark):
    """The approximate branch may lose recall but never breaks the filter
    or fabricates scores: results are a subset of the deep exact filtered
    ranking with identical cosines."""
    from pyspark.sql import functions as F

    deep = dict(_exact_filtered(spark, label=3, k=200))
    got = textops.knn_filtered_topk(
        spark, SF, query_vec_id=0, k=5,
        filter_pred=F.col("label") == 3,
        exact_mult=0, n_cells=4, n_probe=2,
    ).collect()
    assert len(got) == 5
    for r in got:
        assert deep[int(r["vec_id"])] == r["cos"]


def test_dedup_spans_semantics(spark, tmp_path):
    """ExactSubstr output: doc 0 (lowest doc_id) keeps the shared span,
    doc 1 loses exactly the covered tokens, unique/short docs untouched.
    Doc 2's text is doc 0's shared prefix plus a unique tail: only the
    5-grams fully inside the shared region dup, so coverage ends where the
    last duplicated gram ends."""
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, shared, "en", "s", 1),                      # keeper of every gram
        (1, shared + " omega psi", "en", "s", 1),       # loses the shared 6
        (2, "one two three four five six", "en", "s", 1),  # unique
        (3, "tiny doc", "en", "s", 1),                  # < k tokens
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    res = {int(r["doc_id"]): r for r in
           textops.dedup_spans(spark, out, k=5).collect()}
    assert res[0]["clean_text"] == shared and res[0]["n_removed"] == 0
    # doc 1: grams at starts 0,1 dup (inside shared region); starts 2,3 end
    # in the unique tail so they don't dup -> covered tokens 0..5
    assert res[1]["clean_text"] == "omega psi"
    assert res[1]["n_tokens"] == 8 and res[1]["n_removed"] == 6
    assert res[2]["n_removed"] == 0 and res[2]["clean_text"].startswith("one")
    assert res[3]["clean_text"] == "tiny doc" and res[3]["n_removed"] == 0


# ------------------------------------------------------------------- BPE


def test_bpe_kernel_matches_reference_tokenizer(spark):
    """Parity fixture: the Spark Arrow kernel must count exactly what the
    canonical (GPT-2-loop) tokenizer counts, applied driver-side, on ~100
    real corpus docs."""
    from lucene_spark.functions.bpe import count_tokens, load_ranks, make_bpe

    rows = (
        textops.docs(spark, SF).orderBy("doc_id").limit(100).collect()
    )
    bpe = make_bpe(load_ranks())
    expected = {int(r["doc_id"]): count_tokens(r["text"], bpe) for r in rows}
    got = {
        int(r["doc_id"]): int(r["bpe_tokens"])
        for r in textops.token_counts(spark, SF).collect()
        if int(r["doc_id"]) in expected
    }
    assert got == expected
    # a real merges table must actually compress: fewer BPE tokens than
    # characters, more than whitespace words (subword granularity)
    sample = rows[0]["text"]
    assert len(bpe(sample.split(" ")[0])) >= 1


def test_bpe_sequential_rank_equals_priority_loop(spark):
    """Pins the oracle's equivalence argument (functions/bpe.py docstring):
    applying merges as leftmost replace-all per rank IN RANK ORDER equals
    the rank-priority loop, for every distinct piece in the corpus."""
    from lucene_spark.functions.bpe import (
        BPE_PIECE_RE, load_merges, load_ranks, make_bpe,
    )

    merges = load_merges()
    bpe = make_bpe(load_ranks())
    pieces = set()
    for r in textops.docs(spark, SF).select("text").collect():
        pieces.update(BPE_PIECE_RE.findall(r["text"]))
    assert pieces
    for piece in pieces:
        s = " ".join(piece)
        for a, b in merges:
            s = s.replace(f"{a} {b}", a + b)
        assert tuple(s.split(" ")) == bpe(piece), piece


def test_bpe_train_is_deterministic_and_valid():
    """Training twice gives identical merges; every merge's sides are
    single chars or the product of an EARLIER merge (table validity — the
    property the sequential-replay equivalence relies on)."""
    from lucene_spark.functions.bpe import load_merges, train_bpe

    texts = ["low low lower lowest", "new newer newest wide wider"] * 3
    m1, m2 = train_bpe(texts, 32), train_bpe(texts, 32)
    assert m1 == m2
    committed = load_merges()
    assert committed, "bpe_merges.txt must ship non-empty"
    for table in (m1, committed):
        known = set()
        for a, b in table:
            for side in (a, b):
                assert len(side) == 1 or side in known, (a, b)
            known.add(a + b)


def test_pii_scrub_redacts(spark):
    """The scrubber actually removes the injected PII: masks present,
    counts >= 1 per doc, and no raw email/IP/phone survives."""
    import re

    from lucene_spark.operators.textops import (
        PII_EMAIL, PII_IPV4, PII_PHONE, pii_scrub,
    )

    pdf = pii_scrub(spark, "/root/testdata/sf0.001").limit(50).toPandas()
    assert (pdf.n_emails >= 1).all()
    assert (pdf.n_ips >= 1).all()
    assert (pdf.n_phones >= 1).all()
    for t in pdf.clean_text:
        assert "<EMAIL>" in t and "<IP>" in t and "<PHONE>" in t
        assert not re.search(PII_EMAIL, t)
        assert not re.search(PII_IPV4, t)
        assert not re.search(PII_PHONE, t)


def test_normalize_text_idempotent(spark):
    """Normalization is a fixpoint: normalizing the normalized text is a
    no-op, and the md5 matches the emitted string."""
    import hashlib
    import re

    from lucene_spark.operators.textops import normalize_text

    pdf = normalize_text(spark, "/root/testdata/sf0.001").limit(50).toPandas()
    for t, h in zip(pdf.norm_text, pdf.norm_md5):
        again = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        assert again == t
        assert hashlib.md5(t.encode()).hexdigest() == h
