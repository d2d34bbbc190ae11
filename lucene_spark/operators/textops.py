"""Training-data pipeline operators over the documents/embeddings tables.

Large-scale corpus curation ops that complement the inverted index: exact and
near deduplication, similarity search, language/quality heuristics, token
accounting, and fingerprinting. All of them are plain DataFrame/SQL plans
(JVM-side, codegen'd — no Python UDFs), so Catalyst handles pushdown and AQE
handles skew; the shapes are chosen to survive 100 TB:

  - dedup joins go through hash/band *buckets* (LSH), never all-pairs;
  - hashes are md5-derived (same bytes on any engine) so the DuckDB oracles
    reproduce values exactly;
  - ratios/cosines are computed with a FIXED double-precision expression
    shape (sequential fold over array order) so floats compare exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

# 60-bit int from md5 hex — reproducible in DuckDB as
# CAST('0x' || substr(md5(s),1,15) AS BIGINT)
def _md5_int(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _toks(col: Column) -> Column:
    return F.filter(F.split(col, " "), lambda t: t != "")


def _shingles(col: Column, k: int) -> Column:
    """k-gram token shingles as strings (space-joined), in document order.

    Built as a k-way ``zip_with`` of shifted slices of the token array, NOT
    as ``transform(sequence(1, n-k+1), i -> slice(toks, i, k))``: a lambda
    body that references the tokenization subtree makes Catalyst re-evaluate
    split+filter on EVERY lambda invocation (higher-order functions are
    interpreted, no common-subexpression elimination), turning shingling
    O(tokens²) per doc — measured 30x slower on ~800-token webtext docs.
    Here ``toks`` is referenced only OUTSIDE lambdas (k+1 slices), so cost
    is O(k · tokens).

    Docs with fewer than k tokens yield an empty array: the slice length
    ``greatest(n-k+1, 0)`` clamps to 0 (slice with length 0 is legal; a
    sequence(1, 0) would be DESCENDING [1, 0] and slice(_, 0, _) throws).
    """
    toks = _toks(col)
    m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    sh = F.slice(toks, 1, m)
    for j in range(1, k):
        sh = F.zip_with(
            sh, F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return sh


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------------- dedup


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical = min doc_id among identical texts.

    Scale path: groupBy(md5(text)) — a hash shuffle, no text comparison
    fan-out. Emits every doc with its canonical id and duplicate flag.
    """
    d = docs(spark, sf_dir).select("doc_id", _md5_int(F.col("text")).alias("h"))
    # window over the hash, not groupBy + self-join: one corpus scan instead
    # of two (the join form computes md5(text) per side)
    w = Window.partitionBy("h")
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    ).select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        "group_size",
    )


N_MINHASH = 16
# 31-bit Mersenne prime: (h % p) * a + b stays far below 2^63, so the same
# expression is overflow-safe in both Spark and DuckDB (which errors on
# BIGINT overflow rather than wrapping)
MINHASH_P = (1 << 31) - 1
MINHASH_A = [2 * i + 3 for i in range(N_MINHASH)]
MINHASH_B = [5 * i + 7 for i in range(N_MINHASH)]
SHINGLE_K = 3


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc with all N_MINHASH signature columns s0..s{n-1}.

    sig_i = min(((h mod p) * a_i + b_i) mod p) over distinct 3-gram shingle
    hashes h. The mod happens BEFORE the multiply so the int64 arithmetic
    never overflows — Spark wraps silently but DuckDB (the oracle) errors,
    and the two must compute identical values.
    """
    d = docs(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct(_shingles(F.col("text"), SHINGLE_K))).alias("sh")
    )
    d = d.select("doc_id", (_md5_int(F.col("sh")) % F.lit(MINHASH_P)).alias("h"))
    sigs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"s{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return d.groupBy("doc_id").agg(*sigs)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures, long form: one row per (doc_id, i, sig).

    Shingle hash h = md5-int of the shingle string, so signatures are
    engine-independent. Scale: explode+groupBy — a single shuffle keyed by
    doc, partial min map-side.
    """
    agg = _minhash_wide(spark, sf_dir)
    pairs = F.array(*[
        F.struct(F.lit(i).alias("i"), F.col(f"s{i}").alias("sig")) for i in range(N_MINHASH)
    ])
    return agg.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.i").alias("i"), F.col("p.sig").alias("sig")
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str, bands: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over the signatures.

    rows = N_MINHASH/bands per band; docs sharing a band key become
    candidates. Band keys are built from the wide signature row (concat in
    fixed i order — no collect_list order nondeterminism).

    Pairs are STARS, not cliques: each bucket emits (bucket-min doc ↔
    member), so a degenerate band key (a template family where thousands of
    near-identical docs share every band) is LINEAR in bucket size instead
    of quadratic — the round-2 100-TB finding. Connected components are
    preserved (every member links to the bucket min), so downstream
    ``dedup_clusters`` labels are identical to the clique form.
    """
    wide = _minhash_wide(spark, sf_dir)
    rows_per_band = N_MINHASH // bands
    band_structs = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws(
                "_",
                *[F.col(f"s{j * rows_per_band + r}").cast("string") for r in range(rows_per_band)],
            ).alias("bkey"),
        )
        for j in range(bands)
    ])
    keys = wide.select("doc_id", F.explode(band_structs).alias("p")).select(
        "doc_id", F.col("p.band").alias("band"), F.col("p.bkey").alias("bkey")
    )
    # bucket min + size via a window over the band key, NOT a groupBy +
    # self-join: the join form evaluates the doc→shingle→minhash subtree
    # TWICE (once per join side — two full scans of the corpus per action).
    # One window = one scan, one shuffle; a Zipf-hot bucket is one sorted
    # window partition (linear), same skew profile the join had.
    w = Window.partitionBy("band", "bkey")
    return (
        keys.select(
            "doc_id",
            F.min("doc_id").over(w).alias("doc_a"),
            F.count(F.lit(1)).over(w).alias("sz"),
        )
        .filter((F.col("sz") > 1) & (F.col("doc_id") > F.col("doc_a")))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard similarity for near-dup pairs >= threshold.

    Joins through shingle-hash buckets (inverted shingle index), so only
    docs SHARING a shingle are compared — Zipf-safe with AQE skew join.
    """
    sh = docs(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct(_shingles(F.col("text"), SHINGLE_K))).alias("sh")
    ).select("doc_id", _md5_int(F.col("sh")).alias("h"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
    )


def ngram_jaccard_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5, bands: int = 4
) -> DataFrame:
    """Exact n-gram Jaccard, verified ONLY on MinHash-LSH candidate pairs —
    the 100-TB path: the all-shingle bucket join of ``ngram_jaccard_pairs``
    goes quadratic on a Zipf-hot shingle, while here the expensive exact
    intersection touches just the pairs that banded LSH surfaced.

    Plan shape: candidates (per-band bucket join, never all-pairs) →
    broadcast-friendly semi-restricted shingle join → per-pair counts.
    Approximate by design: a true near-dup pair missed by every band is not
    verified (classic MinHash-LSH contract).
    """
    cand = minhash_lsh_pairs(spark, sf_dir, bands=bands)
    sh = docs(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct(_shingles(F.col("text"), SHINGLE_K))).alias("sh")
    ).select("doc_id", _md5_int(F.col("sh")).alias("h"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("h"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("h"))
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
    )


def simhash(spark: SparkSession, sf_dir: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: bit b set iff sum of (+1/-1) votes over token
    hashes is positive, weighted by term frequency."""
    t = docs(spark, sf_dir).select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("tok")
    ).select("doc_id", _md5_int(F.col("tok")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = t.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


# ------------------------------------------------------- similarity search


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity via try_divide: a zero vector yields NULL (dropped
    by threshold filters, ordered after real scores) instead of an ANSI
    divide-by-zero error. DuckDB's float division by zero is NULL too, so
    the oracles agree on degenerate vectors."""
    return F.try_divide(_dot(a, b), F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def ann_cosine_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against one query vector (the exact baseline;
    the LSH-bucketed variant below is the scale path).

    The query vector rides along via a broadcast cross join; the fold order
    is the array order, so scores are bit-reproducible.
    """
    e = embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            _cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def lsh_plane_sign(p: int, i: int) -> float:
    """Deterministic ±1 hyperplane component for (plane p, dimension i)."""
    import hashlib

    hb = hashlib.md5(f"{p}:{i}".encode()).digest()[0]
    return 1.0 if hb & 1 == 0 else -1.0


def _plane_matrix(dim: int, n_planes: int):
    import numpy as np

    return np.array(
        [[lsh_plane_sign(p, i) for i in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


def _bucket_ids_np(x, planes):
    """Bucket ids for a batch of vectors: bit p set iff <x, plane_p> > 0.

    The dot product is an explicit LEFT FOLD over dimensions in float64 —
    the same IEEE op sequence as the DuckDB oracle's literal
    ``v[1]*s + v[2]*s + ...`` chain, so near-zero projections land on the
    same side in both engines. (A matmul's pairwise summation would not.)
    """
    import numpy as np

    n, dim = x.shape
    acc = np.zeros((n, planes.shape[0]), dtype=np.float64)
    for i in range(dim):
        acc += x[:, i : i + 1] * planes[:, i][None, :]
    bits = (acc > 0).astype(np.int64)
    return (bits << np.arange(planes.shape[0], dtype=np.int64)[None, :]).sum(axis=1)


def with_lsh_bucket(df: DataFrame, n_planes: int,
                    vec_col: str = "embedding") -> DataFrame:
    """Attach a random-hyperplane LSH bucket column via one Arrow kernel.

    Round 1 built the projection as a dim × n_planes Catalyst Column tree —
    at real dims (768 × 8 ≈ 6k Add expressions) plan build/codegen blows
    up. The kernel is a constant-size plan and a vectorized fold; planes
    derive from (plane, dim) hashes so no model is stored and the batch
    discovers ``dim`` itself (no driver ``.first()`` probe).
    """
    import numpy as np
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, bucket int"

    def kernel(batches):
        planes = None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if planes is None:
                planes = _plane_matrix(x.shape[1], n_planes)
            out = pdf.copy()
            out["bucket"] = _bucket_ids_np(x, planes).astype(np.int32)
            yield out

    return df.mapInPandas(kernel, schema=schema)


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Scale-path ANN: random-hyperplane LSH bucket, then exact cosine within
    the probed bucket (approximate — may miss true neighbors by design).

    Hyperplanes are deterministic pseudo-vectors derived from (plane, dim)
    hashes, so the plan is reproducible without storing a model.
    """
    e = embeddings(spark, sf_dir)
    eb = with_lsh_bucket(e.select("vec_id", "embedding"), n_planes)
    qrow = eb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = (
        eb.join(F.broadcast(qrow), eb["bucket"] == F.col("qbucket"))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            _cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
    )
    return cand.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def _ivf_centroids(vecs, n_cells: int, iters: int):
    """Deterministic Lloyd k-means on unit-normalized vectors (cosine cells).

    Init = the first n_cells vectors in vec_id order; fixed iteration count;
    no RNG anywhere, so the model reproduces bit-identically on any run.
    Driver-side numpy on a bounded sample (at corpus scale the sample is
    capped, the assignment below stays distributed).
    """
    import numpy as np

    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    c = x[:n_cells].copy()
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    c[j] = m / norm
    return c


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    iters: int = 5,
    sample_cap: int = 10_000,
) -> DataFrame:
    """IVF ANN: k-means cells + probe-the-nearest-cells search.

    Train: deterministic k-means on a bounded vec_id-ordered sample
    (driver-side numpy). Search: assign every vector to its nearest
    centroid in a vectorized Arrow kernel (batch matmul), keep only the
    ``n_probe`` cells nearest the query, exact cosine within — scan cost
    ~ n_probe/n_cells of the corpus. ``n_probe=n_cells`` degenerates to
    exact brute force (the recall=1 check used in tests).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    e = embeddings(spark, sf_dir)
    sample = np.array(
        [r["embedding"] for r in e.orderBy("vec_id").limit(sample_cap).collect()],
        dtype=np.float64,
    )
    cents = _ivf_centroids(sample, n_cells, iters)
    bc = spark.sparkContext.broadcast(cents)

    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("cell", T.IntegerType())]
    )

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cell": (x @ c.T).argmax(axis=1).astype(np.int32),
                }
            )

    cells = e.select("vec_id", "embedding").mapInPandas(assign, schema=schema)
    q_vec = np.array(
        e.filter(F.col("vec_id") == query_vec_id).first()["embedding"], dtype=np.float64
    )
    qn = q_vec / np.linalg.norm(q_vec)
    probe = np.argsort(-(cents @ qn))[:n_probe].tolist()

    cand = (
        e.join(cells, "vec_id")
        .filter(F.col("cell").isin([int(p) for p in probe]))
        .filter(F.col("vec_id") != query_vec_id)
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("qv"))
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        _cosine(F.col("embedding"), F.col("qv")).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def knn_filtered_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    filter_pred: "Column | None" = None,
    n_cells: int = 16,
    n_probe: int = 2,
    exact_mult: int = 20,
    iters: int = 5,
    sample_cap: int = 10_000,
) -> DataFrame:
    """Filtered KNN: cosine top-k restricted to a metadata predicate, with
    Lucene's two-phase strategy (``core/search/AbstractKnnVectorQuery.java``
    rewrite + ``KnnFloatVectorQuery.java``):

      1. Evaluate the filter first (the BitSet pass). If its cardinality is
         small — here <= ``exact_mult * k`` — search EXACTLY over just the
         filtered vectors (Lucene's exact-search branch when filtered docs
         <= k/visit budget). The predicate pushes into the Parquet scan, so
         the exact branch reads only matching row groups.
      2. Otherwise run the approximate path (IVF probe, the HNSW analog)
         restricted to accepted vectors, with the fallback Lucene gets from
         its visitedLimit: if the probed cells hold fewer than k accepted
         candidates, re-run exactly over the full filtered set — never
         return fewer than min(k, |filter|) hits.

    Scores use the same deterministic double fold as the ANN family, so
    every branch is oracle-exact for its candidate set.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    e = embeddings(spark, sf_dir)
    base = e.filter(F.col("vec_id") != query_vec_id)
    filt = base.filter(filter_pred) if filter_pred is not None else base
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )

    def exact_over(df: DataFrame) -> DataFrame:
        scored = df.crossJoin(F.broadcast(q)).select(
            "vec_id",
            _cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
        return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)

    n_filtered = filt.count()
    if n_filtered <= exact_mult * k:
        return exact_over(filt)

    # approximate branch: IVF cells over the filtered set only
    sample = np.array(
        [r["embedding"] for r in e.orderBy("vec_id").limit(sample_cap).collect()],
        dtype=np.float64,
    )
    cents = _ivf_centroids(sample, n_cells, iters)
    bc = spark.sparkContext.broadcast(cents)
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("cell", T.IntegerType())]
    )

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cell": (x @ c.T).argmax(axis=1).astype(np.int32),
                }
            )

    cells = filt.select("vec_id", "embedding").mapInPandas(assign, schema=schema)
    q_vec = np.array(
        e.filter(F.col("vec_id") == query_vec_id).first()["embedding"],
        dtype=np.float64,
    )
    qn = q_vec / np.linalg.norm(q_vec)
    probe = np.argsort(-(cents @ qn))[:n_probe].tolist()
    cand = filt.join(
        cells.filter(F.col("cell").isin([int(p) for p in probe])).select("vec_id"),
        "vec_id",
    )
    if cand.count() < min(k, n_filtered):
        # visitedLimit-style fallback: approximate pass can't fill k
        return exact_over(filt)
    return exact_over(cand)


def embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.9, n_planes: int = 0
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold).

    ``n_planes=0``: exact all-pairs — the correctness baseline the oracle
    checks. ``n_planes>0``: LSH-bucketed scale path — only pairs agreeing on
    every random-hyperplane sign are compared, so the join is per-bucket
    (approximate: antipodal near-dups across a plane are missed by design).
    """
    e = embeddings(spark, sf_dir)
    if n_planes > 0:
        e = with_lsh_bucket(e.select("vec_id", "embedding"), n_planes)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        *([F.col("bucket").alias("ba")] if n_planes > 0 else []),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        *([F.col("bucket").alias("bb")] if n_planes > 0 else []),
    )
    cond = F.col("vec_a") < F.col("vec_b")
    if n_planes > 0:
        cond = cond & (F.col("ba") == F.col("bb"))
    return (
        a.join(b, cond)
        .select(
            "vec_a",
            "vec_b",
            _cosine(F.col("ea"), F.col("eb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# ------------------------------------------------------------ text analysis

# tiny frozen per-language stopword lists (public common-word lists) for the
# stopword-ratio language-ID heuristic
LANG_STOPS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "a", "is", "that", "it", "was"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"),
    "es": ("el", "de", "que", "y", "en", "los", "del", "se", "las", "por"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space chars
# pre-tokenizer pattern, shared with the DuckDB oracle; MUST stay equal to
# functions/bpe.py BPE_PIECE_RE (the Arrow kernel's piece regex)
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per doc: whitespace tokens + REAL merges-table BPE.

    ``bpe_tokens`` applies the committed merges table
    (``functions/bpe_merges.txt``, Sennrich-trained) with the GPT-2 apply
    loop in one Arrow ``mapInPandas`` kernel — piece-level lru_cache makes
    Zipf-hot pieces O(1), so the kernel is bounded by unique pieces per
    task, not tokens. ``ws_tokens`` stays a JVM expression but is emitted
    from the same pass (one corpus scan). The DuckDB twin replays the
    merges as a rank-ordered replace chain over DISTINCT pieces — see the
    equivalence note in ``functions/bpe.py``."""
    import pandas as pd

    from ..functions.bpe import count_tokens, load_ranks, make_bpe

    d = docs(spark, sf_dir)
    ranks = load_ranks()

    def kernel(batches):
        bpe = make_bpe(ranks)
        for pdf in batches:
            ws = pdf["text"].map(
                lambda t: sum(1 for w in t.split(" ") if w)
            )
            bp = pdf["text"].map(lambda t: count_tokens(t, bpe))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ws_tokens": ws.astype("int64"),
                    "bpe_tokens": bp.astype("int64"),
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, ws_tokens long, bpe_tokens long"
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID: argmax over per-language common-word hit
    ratios; ties break to the earlier language in LANG_STOPS order."""
    d = docs(spark, sf_dir)
    toks = _toks(F.col("text"))
    n = F.size(toks)
    langs = list(LANG_STOPS)
    cands = []
    for pri, lang in enumerate(langs):
        arr = F.array(*[F.lit(w) for w in LANG_STOPS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        # coalesce(try_divide): a zero-token doc scores 0.0 for every
        # language (argmax then falls to the highest-priority language)
        # instead of an ANSI divide-by-zero error
        ratio = F.coalesce(
            F.try_divide(hits.cast("double"), n.cast("double")), F.lit(0.0)
        )
        cands.append(
            F.struct(
                ratio.alias("ratio"),
                F.lit(len(langs) - pri).alias("pri"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*cands))
    return d.select(
        "doc_id",
        best.getField("lang").alias("lang_pred"),
        best.getField("ratio").alias("lang_score"),
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality/accounting metrics per doc: token counts, type-token ratio,
    mean token length, English-stopword ratio (the language-ID heuristic)."""
    from ..functions.analysis import ENGLISH_STOP_WORDS

    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    d = docs(spark, sf_dir)
    toks = _toks(F.col("text"))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_uniq = F.size(F.array_distinct(toks))
    total_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    # try_divide: a zero-token doc gets NULL ratios instead of an ANSI
    # divide-by-zero crash (Spark 4 defaults ANSI on); the DuckDB twin's
    # LEFT JOIN yields the same NULLs for token-less docs.
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_unique"),
        n_stop.cast("long").alias("n_stopwords"),
        F.try_divide(n_uniq.cast("double"), n.cast("double")).alias("type_token_ratio"),
        F.try_divide(total_chars.cast("double"), n.cast("double")).alias("mean_token_len"),
        F.try_divide(n_stop.cast("double"), n.cast("double")).alias("stopword_ratio"),
        (F.try_divide(n_stop.cast("double"), n.cast("double")) >= 0.15).alias("lang_en_guess"),
    )


# PII patterns (Dolma / BigScience-ROOTS style regex scrubbing): kept to a
# syntax subset with identical semantics in Java regex (Spark) and RE2
# (DuckDB) so the oracle twin is byte-exact. Application order is fixed:
# email, then IPv4, then phone.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 ()-]{6,14}[0-9]"


def _with_pii(col: Column) -> Column:
    """Deterministically inject synthetic PII per doc (the test corpus has
    none): the gate then proves the scrubber actually redacts, not that it
    no-ops. Same expression mirrored in the SQL oracle."""
    return F.concat(
        col,
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or +1415555"), F.format_string("%04d", F.col("doc_id") % 10000),
    )


def pii_scrub(spark: SparkSession, sf_dir: str,
              inject: bool = True) -> DataFrame:
    """PII redaction (the standard pre-training scrub pass — emails, IPv4s,
    E.164-ish phone numbers replaced with typed mask tokens, per-doc match
    counts kept for auditing).

    Scale shape: pure column expressions over one scan — no shuffle, no
    UDF; Catalyst keeps the whole pass in one projection. ``inject=True``
    (the gate default) appends deterministic synthetic PII first, since
    the benchmark corpus contains none.
    """
    d = docs(spark, sf_dir)
    text = _with_pii(F.col("text")) if inject else F.col("text")
    n_email = F.regexp_count(text, F.lit(PII_EMAIL))
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(after_email, F.lit(PII_IPV4))
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(after_ip, F.lit(PII_PHONE))
    clean = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
    )


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-normalization pass (CCNet/Gopher-style): lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim — the
    canonical form fed to exact/fuzzy dedup so near-identical pages hash
    together. One projection, no shuffle; emits the normalized text and
    its md5 so exact dedup over the normalized form is one groupBy away.
    """
    d = docs(spark, sf_dir)
    t = F.lower(F.col("text"))
    t = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    t = F.trim(t)
    return d.select(
        "doc_id",
        t.alias("norm_text"),
        F.md5(t).alias("norm_md5"),
    )


def html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction through the HTMLStripCharFilter port
    (``functions/html.py``; reference
    ``analysis/common/.../charfilter/HTMLStripCharFilter.jflex``).

    Each doc's text is framed as a deterministic synthetic web page —
    even doc_ids get a clean-profile page (exercises the Arrow RE2
    fast-path tier), odd doc_ids a page with ``&nbsp;`` entities and a
    ``<script>`` block whose body contains markup (exercises the Python
    scanner tier) — then the real kernel recovers the text.

    Scale shape: one projection builds the html column, one ``mapInPandas``
    Arrow kernel strips it — no shuffle, no driver-resident data; at 100 TB
    this is the extraction stage of the crawl pipeline, embarrassingly
    parallel over pages.
    """
    d = docs(spark, sf_dir)
    even = F.concat(
        F.lit("<html><head><title>t</title></head><body><p>"),
        F.regexp_replace(F.col("text"), " ", "</p><p>"),
        F.lit("</p></body></html>"),
    )
    odd = F.concat(
        F.lit("<html><body><p>"),
        F.regexp_replace(F.col("text"), " ", "&nbsp;</p>\n<p>"),
        F.lit('</p><script>var x = "<p>";</script></body></html>'),
    )
    page = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, even).otherwise(odd).alias("html"),
    )

    def kern(batches):
        import pandas as pd

        from ..functions.html import html_strip_batch

        for pdf in batches:
            if pdf.empty:
                continue
            out = html_strip_batch(pdf["html"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "extracted": out.to_pandas()}
            )

    return page.mapInPandas(kern, schema="doc_id long, extracted string")


def mapping_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MappingCharFilter over the corpus (``functions/charfilter.py``;
    reference charfilter/MappingCharFilter.java + NormalizeCharMap): a
    fixed normalization map applied with greedy longest-match,
    replacements not re-scanned. One ``mapInPandas`` projection — no
    shuffle, no driver state."""
    d = docs(spark, sf_dir)

    def kern(batches):
        import pandas as pd

        from ..functions.charfilter import (
            NormalizeCharMap, mapping_char_filter_batch,
        )

        # patterns chosen mutually non-overlapping (no suffix of one is a
        # prefix of another) with pattern-free outputs, so the DuckDB
        # sequential-replace twin is exactly the scanner's single pass
        cmap = NormalizeCharMap({
            "scan": "sweep", "merge": "combine", "window": "pane",
        })
        for pdf in batches:
            if pdf.empty:
                continue
            out = mapping_char_filter_batch(pdf["text"], cmap)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "mapped": out.to_pandas()})

    return d.select("doc_id", "text").mapInPandas(
        kern, schema="doc_id long, mapped string"
    )


def repetition_stats(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Within-document repetition metrics (Gopher/RefinedWeb-style quality
    rules): duplicate k-gram fraction and top-k-gram mass per doc. High
    values flag boilerplate/spam for corpus filtering.

    Scale shape: explode → groupBy(doc, gram) → groupBy(doc), two
    hash-partitioned shuffles with map-side partial aggregation — O(tokens)
    work (an earlier nested-Column formulation was O(unique·total) per doc,
    quadratic on long boilerplate docs, exactly what this op exists to
    catch)."""
    d = docs(spark, sf_dir)
    per = (
        d.select("doc_id", F.explode(_shingles(F.col("text"), k)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_uniq"),
        F.max("c").alias("top"),
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n") - F.col("n_uniq"), F.lit(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.coalesce(
                (F.col("n") - F.col("n_uniq")).cast("double") / F.col("n"), F.lit(0.0)
            ).alias("dup_gram_ratio"),
            F.coalesce(
                F.col("top").cast("double") / F.col("n"), F.lit(0.0)
            ).alias("top_gram_ratio"),
        )
    )


def cross_doc_dup_ngrams(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Cross-document duplicated k-gram fraction per doc — the measurement
    behind substring-level dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"), re-expressed as fixed-k gram
    occurrence duplication instead of a suffix array: a doc's k-gram
    occurrence is "duplicated" iff the same gram occurs in >= 2 distinct
    documents. High cross_dup_frac flags boilerplate/mirrored content for
    span-level filtering.

    Scale shape: explode -> groupBy(doc_id, h) count (map-side combine
    collapses within-doc repeats early) -> groupBy(h) doc-frequency over the
    already-distinct (doc, h) rows -> hash join back on h -> groupBy(doc_id).
    All shuffles are keyed on the 64-bit gram hash; a boilerplate gram shared
    by millions of docs is ONE row on the doc-frequency side (no skew
    amplification), and grams travel as md5-int64, never strings.
    """
    d = docs(spark, sf_dir)
    occ = (
        d.select("doc_id", F.explode(_shingles(F.col("text"), k)).alias("g"))
        .select("doc_id", _md5_int(F.col("g")).alias("h"))
        .groupBy("doc_id", "h")
        .agg(F.count("*").alias("c"))
    )
    dfreq = occ.groupBy("h").agg(F.count("*").alias("n_docs"))
    agg = (
        occ.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "dup"
            ),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("dup"), F.lit(0)).cast("long").alias("n_cross_dup_grams"),
            F.coalesce(
                F.col("dup").cast("double") / F.col("n"), F.lit(0.0)
            ).alias("cross_dup_frac"),
        )
    )


def quality_filter(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_tok: float = 3.0,
    max_mean_tok: float = 5.0,
    min_stop_ratio: float = 0.04,
    max_dup_gram_ratio: float = 0.05,
    max_top_gram_ratio: float = 0.10,
) -> DataFrame:
    """Gopher/RefinedWeb-style document quality filter: per-rule booleans +
    a combined keep decision, composed from :func:`text_stats` (length,
    mean token length, stopword ratio) and :func:`repetition_stats`
    (duplicate/top k-gram mass). The per-rule columns make the drop reasons
    auditable, which is how curation pipelines tune thresholds.

    Scale shape: text_stats is map-side-only column math and
    repetition_stats is one explode + two doc-keyed aggregations; the
    composite adds one doc_id equi-join of two NARROW per-doc stat tables
    (the heavy text column is scanned twice map-side but never shuffled).
    """
    st = text_stats(spark, sf_dir)
    rep = repetition_stats(spark, sf_dir, k=3)
    j = st.join(rep, "doc_id")
    # Zero-token docs: the ratio columns are NULL (0/0), so ratio rules
    # coalesce to False — an empty doc is dropped with auditable reasons,
    # identically on both engines (pinned by the empty-doc parity test).
    rules = {
        "len_ok": (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens),
        "tok_len_ok": F.coalesce(
            (F.col("mean_token_len") >= min_mean_tok)
            & (F.col("mean_token_len") <= max_mean_tok),
            F.lit(False),
        ),
        "stop_ok": F.coalesce(
            F.col("stopword_ratio") >= min_stop_ratio, F.lit(False)
        ),
        "rep_ok": (F.col("dup_gram_ratio") <= max_dup_gram_ratio)
        & (F.col("top_gram_ratio") <= max_top_gram_ratio),
    }
    out = j.select("doc_id", *[v.alias(k) for k, v in rules.items()])
    return out.withColumn(
        "keep",
        F.col("len_ok") & F.col("tok_len_ok") & F.col("stop_ok") & F.col("rep_ok"),
    )


def contamination_check(
    spark: SparkSession, sf_dir: str, probe_doc_ids: "list[int]", k: int = 5
) -> DataFrame:
    """Benchmark-contamination scan: docs sharing any k-gram shingle with
    the probe set (e.g. an eval benchmark's documents).

    Scale path: probe shingles are FEW (benchmark-sized) → broadcast
    semi-join against the corpus shingle stream; the corpus is scanned
    once, no all-pairs anything. Probe docs themselves are excluded.
    """
    d = docs(spark, sf_dir)
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(_shingles(F.col("text"), k))).alias("sh")
    ).select("doc_id", _md5_int(F.col("sh")).alias("h"))
    probes = (
        sh.filter(F.col("doc_id").isin([int(i) for i in probe_doc_ids]))
        .select("h")
        .distinct()
    )
    hits = (
        sh.filter(~F.col("doc_id").isin([int(i) for i in probe_doc_ids]))
        .join(F.broadcast(probes), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return hits.select("doc_id", "n_shared_grams")


def stratified_sample(
    spark: SparkSession, sf_dir: str, rates: "dict[str, float]", buckets: int = 1000
) -> DataFrame:
    """Deterministic per-language subsampling (training-mix shaping): keep a
    doc iff md5-hash-bucket(doc_id) < rate[lang]·buckets. Hash-based so the
    sample is stable across runs/engines and needs no shuffle or RNG state;
    unknown languages drop (rate 0)."""
    d = docs(spark, sf_dir)
    bucket = _md5_int(F.col("doc_id").cast("string")) % F.lit(buckets)
    thresh = F.lit(0)
    for lang, rate in sorted(rates.items()):
        thresh = F.when(F.col("lang") == lang, F.lit(int(rate * buckets))).otherwise(thresh)
    return d.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < thresh
    ).select("doc_id", "lang", "bucket")


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Min-label connected components over an undirected edge list
    (``a``/``b`` columns; both orientations expected), for all ``doc_id``
    in ``nodes``. Returns (doc_id, label) with label = component minimum.

    Each round does (1) a neighbor-min label exchange (one hop of label
    travel) and (2) a pointer-doubling compression — every node adopts its
    label's own label (``l[v] ← min(l[v], l[l[v]])``), which halves
    label-chain depth per round (Shiloach–Vishkin hook-and-compress; the
    same convergence class as large-star/small-star in Kiveris et al.,
    "Connected Components in MapReduce and Beyond"). Convergence is
    O(log diameter), so a 1M-doc chain needs ~20 rounds, not 1M — the
    shape that matters at 100 TB where template families can chain.

    The invariant (every label is a node id inside the same component,
    ≥ the component min) holds for both steps, and at fixpoint every
    edge's endpoints carry equal labels = the component min. The loop
    runs to the exact fixpoint (changed == 0) and FAILS LOUDLY if
    ``max_iters`` is hit first rather than returning silently-wrong
    components. Each round is three bounded shuffles (|edges| join,
    |nodes| self-join, |nodes| compare); the driver only sees counts.
    Lineage is truncated per round with an eager ``localCheckpoint`` —
    ``hooked`` feeds two branches of the doubling join, so without the
    cut the logical plan doubles every round and Catalyst blows up
    exponentially (the classic iterative-algorithm trap)."""
    edges = edges.cache()
    labels = nodes.select(
        F.col("doc_id"), F.col("doc_id").alias("label")
    ).localCheckpoint()
    converged = False
    for _ in range(max_iters):
        # (1) neighbor minimum label — one hop
        neigh = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        hooked = labels.join(neigh, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        ).localCheckpoint()
        # (2) pointer doubling: adopt the label's own label
        parent = hooked.select(
            F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
        )
        new_labels = (
            hooked.join(parent, hooked["label"] == parent["p_id"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("p_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(O(log diameter) with pointer doubling); raise max_iters"
        )
    return labels


def dedup_clusters(
    spark: SparkSession, sf_dir: str, bands: int = 4, max_iters: int = 20
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the union of
    exact-dup pairs and MinHash-LSH candidate pairs; canonical = min doc_id
    in the component — the actual dedup endpoint a curation pipeline keeps.
    Components via :func:`connected_components` (pointer-doubled min-label,
    O(log diameter) rounds). Docs in no pair keep themselves as canonical."""
    exact = dedup_exact(spark, sf_dir).filter(F.col("is_duplicate")).select(
        F.col("canonical_id").alias("a"), F.col("doc_id").alias("b")
    )
    lsh = minhash_lsh_pairs(spark, sf_dir, bands=bands).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    edges = exact.unionByName(lsh).distinct()
    # undirected: both directions
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = connected_components(
        edges, docs(spark, sf_dir).select("doc_id"), max_iters=max_iters
    )
    return labels.select(
        "doc_id", F.col("label").alias("cluster_id"),
        (F.col("doc_id") != F.col("label")).alias("is_duplicate"),
    )


def dedup_keep(
    spark: SparkSession, sf_dir: str, bands: int = 4, max_iters: int = 20
) -> DataFrame:
    """The deduplicated corpus: one canonical survivor (min doc_id) per
    near-dup cluster from :func:`dedup_clusters`, with how many docs it
    represents — what a curation pipeline actually writes out after dedup.

    Scale shape: inherits the bucketed LSH + pointer-doubled components
    plan; the survivor filter and size rollup add one cluster_id-keyed
    aggregation (map-side combinable) and a join that AQE plans broadcast
    when the cluster table is small relative to the corpus.
    """
    cl = dedup_clusters(spark, sf_dir, bands=bands, max_iters=max_iters)
    sizes = cl.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_represented")
    )
    return (
        cl.filter(~F.col("is_duplicate"))
        .join(sizes, "cluster_id")
        .select("doc_id", "n_represented")
    )


def dedup_spans(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Substring-level dedup OUTPUT: the cleaned corpus with cross-document
    duplicated spans REMOVED — Lee et al. 2022's ExactSubstr transformation
    (not just the measurement :func:`cross_doc_dup_ngrams` computes).

    Deterministic token-level rule: for every k-gram whose hash occurs in
    >= 2 distinct documents, the single lowest-doc_id document containing
    it keeps its copy (the paper's "leave one occurrence" variant); every
    other document drops all k tokens of each occurrence. A token survives
    iff no removed k-gram occurrence covers it. Output: (doc_id,
    clean_text, n_tokens, n_removed).

    Scale shape: everything is keyed on the 64-bit gram hash or on doc_id —
    gram doc-frequency/keeper is ONE row per gram however hot (no pair
    blow-up, same property as cross_doc_dup_ngrams); coverage expansion is
    bounded by k x gram occurrences; reassembly is one doc_id-keyed
    aggregation whose collect_list is bounded by the doc's own token count
    (the same order of bytes as the input text column).
    """
    d = docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(_toks(F.col("text"))).alias("j", "tok")
    )
    grams = d.select(
        "doc_id", F.posexplode(_shingles(F.col("text"), k)).alias("p", "g")
    ).select("doc_id", "p", _md5_int(F.col("g")).alias("h"))
    stats = grams.groupBy("h").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("keeper"),
    )
    dup_occ = grams.join(stats, "h").filter(
        (F.col("n_docs") >= 2) & (F.col("doc_id") != F.col("keeper"))
    )
    covered = dup_occ.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))).alias("j"),
    ).distinct()
    kept = toks.join(covered, ["doc_id", "j"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("kept_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        d.select("doc_id", F.size(_toks(F.col("text"))).alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("kept_text"), F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per doc: min/max md5-int over 5-gram shingles
    (a 2-value winnowing-style sketch)."""
    sh = docs(spark, sf_dir).select(
        "doc_id", F.explode(_shingles(F.col("text"), 5)).alias("sh")
    ).select("doc_id", _md5_int(F.col("sh")).alias("h"))
    return sh.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"), F.max("h").alias("fp_max"), F.count("*").alias("n_shingles")
    )


def shingle_counts(spark: SparkSession, sf_dir: str, size: int = 2,
                   top_k: int = 20) -> DataFrame:
    """ShingleFilter corpus statistics
    (analysis/common/.../shingle/ShingleFilter.java): analyzed word
    n-grams with the reference's hole semantics — min(gap-1, size-1)
    "_" fillers per hole, leading holes filled, trailing holes not,
    all-filler windows skipped — counted corpus-wide, top_k by
    (count desc, shingle asc).

    One Arrow kernel over the documents scan (the filler-expanded
    stream is numpy index math, no per-token loop), then a single
    partially-aggregated groupBy — the same plan shape as token_counts.
    """
    import pandas as pd

    from ..functions.analysis import analyze_batch, shingle_batch

    def kernel(batches):
        for pdf in batches:
            b = analyze_batch(pdf["text"])
            di, sh = shingle_batch(b, size)
            yield pd.DataFrame({"shingle": sh.astype(str)}) if len(sh) \
                else pd.DataFrame({"shingle": pd.Series(dtype=str)})

    rows = docs(spark, sf_dir).select("text") \
        .mapInPandas(kernel, schema="shingle string")
    return (
        rows.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("shingle"))
        .limit(int(top_k))
    )
