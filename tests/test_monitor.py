"""Monitor (percolator) — register queries, match document streams.

Oracle: a pure-Python per-doc matcher over the same tokenizer output
(the MemoryIndex-per-doc shape of the reference's CandidateMatcher),
compared pair-for-pair with the Spark kernel on randomized corpora.
"""

import random

import numpy as np
import pytest

from lucene_spark.functions.analysis import analyze_batch
from lucene_spark.operators.monitor import ANYTOKEN, Monitor, extract_terms
from lucene_spark.plans.query import (
    BoolQ,
    MatchAllQ,
    PhraseQ,
    PrefixQ,
    TermQ,
    parse_query,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _gen_docs(n, seed):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30))))
        for i in range(n)
    ]


def _tokens(text):
    ab = analyze_batch([text])
    order = np.argsort(ab.tok_positions, kind="stable")
    return (
        list(ab.tok_terms[order]),
        list(ab.tok_positions[order]),
    )


def _brute_match(node, toks, poss):
    if isinstance(node, str):
        node = parse_query(node)
    if isinstance(node, TermQ):
        return node.term in toks
    if isinstance(node, PhraseQ):
        pos_of = {}
        for t, p in zip(toks, poss):
            pos_of.setdefault(t, set()).add(p)
        base = node.offsets[0]
        for p0 in pos_of.get(node.terms[0], ()):
            if all(
                (p0 + o - base) in pos_of.get(t, set())
                for t, o in zip(node.terms, node.offsets)
            ):
                return True
        return False
    if isinstance(node, PrefixQ):
        return any(t.startswith(node.prefix) for t in toks)
    if isinstance(node, MatchAllQ):
        return True
    if isinstance(node, BoolQ):
        req = list(node.must) + list(node.filter)
        if any(not _brute_match(c, toks, poss) for c in req):
            return False
        if any(_brute_match(c, toks, poss) for c in node.must_not):
            return False
        if node.should:
            cnt = sum(_brute_match(c, toks, poss) for c in node.should)
            need = max(node.msm, 0 if req else 1)
            return cnt >= need
        return bool(req)
    raise AssertionError(type(node))


QUERIES = [
    ("t1", "alpha"),
    ("t2", "theta"),
    ("and", "alpha AND beta"),
    ("or", "gamma OR delta"),
    ("not", "alpha AND NOT beta"),
    ("phrase", '"alpha beta"'),
    ("phrase3", '"alpha beta gamma"'),
    ("sloppy", '"alpha gamma"~3'),
    ("prefix", "ze*"),
    ("msm", "(alpha OR beta OR gamma OR delta)"),
    ("nested", "(alpha OR beta) AND (gamma OR delta) AND NOT eps"),
]


def test_extract_terms_guarantee():
    """Every extracted set is a safe over-approximation: a doc matching
    the query must contain one of the extracted terms (or ANYTOKEN)."""
    assert extract_terms(parse_query("alpha")) == frozenset({"alpha"})
    # conjunction keeps only the single best child (longest term)
    assert extract_terms(parse_query("alpha AND ze")) == frozenset({"alpha"})
    # disjunction is the union
    assert extract_terms(parse_query("alpha OR ze")) == frozenset(
        {"alpha", "ze"}
    )
    # phrase = conjunction of its terms; length ties break lexicographically
    assert extract_terms(parse_query('"alpha beta gamma"')) == frozenset(
        {"gamma"}
    )
    # multi-term child cannot be enumerated
    assert ANYTOKEN in extract_terms(parse_query("ze*"))
    # ... but a conjunction with an enumerable sibling avoids ANYTOKEN
    assert extract_terms(parse_query("ze* AND alpha")) == frozenset({"alpha"})


def test_monitor_matches_brute(spark):
    docs = _gen_docs(300, seed=7)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    mon = Monitor(spark, QUERIES)
    got = {
        (r.doc_id, r.query_id)
        for r in mon.match(sdf).collect()
    }
    want = set()
    for doc_id, text in docs:
        toks, poss = _tokens(text)
        for qid, q in QUERIES:
            if qid == "sloppy":
                continue  # covered by kernel-level sloppy gates
            if _brute_match(q, toks, poss):
                want.add((doc_id, qid))
    got_nosloppy = {p for p in got if p[1] != "sloppy"}
    assert got_nosloppy == want
    # sloppy is a superset of the exact phrase and subset of the AND
    sl = {d for d, q in got if q == "sloppy"}
    exact = {
        d
        for d, t in docs
        if _brute_match('"alpha gamma"', *_tokens(t))
    }
    both = {
        d
        for d, t in docs
        if _brute_match("alpha AND gamma", *_tokens(t))
    }
    assert exact <= sl <= both


def test_presearcher_prunes(spark):
    """Docs sharing no term with a query never reach verification, and the
    candidate set is a superset of the match set."""
    mon = Monitor(spark, QUERIES)
    toks, _ = _tokens("eps zeta eps")
    cand = mon.candidate_ids(toks)
    qids = [q[0] for q in QUERIES]
    names = {qids[i] for i in cand}
    assert "prefix" in names  # ANYTOKEN query is always a candidate
    assert "t1" not in names and "phrase" not in names


def test_monitor_streaming(spark, tmp_path):
    """The same match() transformation runs under Structured Streaming
    (stateless mapInPandas over a file stream)."""
    docs = _gen_docs(120, seed=11)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    sdf.write.parquet(inp)
    mon = Monitor(spark, QUERIES)
    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
    q = (
        mon.match(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.query_id)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.query_id) for r in mon.match(sdf).collect()
    }
    assert got == want


def test_unsupported_query_fails_at_register(spark):
    from lucene_spark.plans.query import FunctionScoreQ

    with pytest.raises(NotImplementedError):
        Monitor(spark, [("bad", FunctionScoreQ(TermQ("alpha")))])
