"""Randomized index round-trip (RandomPostingsTester / BasePostingsFormatTestCase
analog, tf/index/RandomPostingsTester.java): seeded random corpora with
adversarial shapes — empty docs, stopword-only docs, hot terms in every doc,
singleton terms, high-freq repeats — build through the full Spark path and
must decode to exactly the naive inverted index, stats included; sampled
queries must be rank- and float32-score-identical to the brute-force oracle.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.operators import indexer
from lucene_spark.operators.oracle import BruteForceIndex
from lucene_spark.operators.search import Searcher, decode_term_blocks
from lucene_spark.plans.query import BoolQ, PhraseQ, TermQ

SEEDS = [3, 17, 202]


def _random_corpus(seed: int, n_docs: int = 160):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(40)]
    stopish = ["the", "of", "and", "to"]  # real stopwords: removed at indexing
    texts = []
    for i in range(n_docs):
        shape = rng.integers(0, 10)
        if shape == 0:
            texts.append("")  # empty doc
        elif shape == 1:
            texts.append(" ".join(rng.choice(stopish, rng.integers(1, 6))))  # stop-only
        elif shape == 2:
            texts.append(" ".join(["hot0"] * int(rng.integers(1, 30))))  # high freq
        else:
            n = int(rng.integers(1, 60))
            toks = rng.choice(vocab + stopish + ["hot0"], n).tolist()
            if shape == 3:
                toks.append(f"singleton{i}")  # df=1 term
            texts.append(" ".join(toks))
    return pd.DataFrame(
        {
            "gid": np.arange(n_docs, dtype=np.int64),
            "url": [f"u{i:05d}" for i in range(n_docs)],
            "text": texts,
        }
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_random_corpus_round_trip(spark, tmp_path, seed):
    pdf = _random_corpus(seed)
    d = str(tmp_path / f"idx{seed}")
    indexer.build_index(
        spark,
        spark.createDataFrame(pdf),
        d,
        key_col="url",
        text_col="text",
        gid_col="gid",
        n_segments=5,
    )
    oracle = BruteForceIndex(pdf["gid"], pdf["url"], pdf["text"])
    s = Searcher(spark, d)

    # collection stats
    assert s.stats["doc_count"] == oracle.doc_count
    assert s.stats["sum_total_term_freq"] == oracle.sum_ttf

    # every term's postings + positions decode identically
    all_rows = s._postings_df().toPandas()
    got_terms = set(all_rows["term"])
    assert got_terms == set(oracle.postings.keys())
    for term, grp in all_rows.groupby("term", sort=False):
        tp = decode_term_blocks(grp, need_positions=True)
        want = oracle.postings[term]
        assert tp.gids.tolist() == sorted(want), term
        assert tp.freqs.tolist() == [want[g] for g in sorted(want)], term
        for g, pos in zip(tp.gids, tp.positions):
            assert pos.tolist() == oracle.positions[(term, int(g))], (term, g)

    # sampled queries: rank + float32 score identical, pruned and unpruned
    rng = np.random.default_rng(seed + 1)
    terms = sorted(oracle.postings)
    queries = [
        TermQ("hot0"),
        TermQ(str(rng.choice(terms))),
        BoolQ(must=(TermQ("hot0"), TermQ(str(rng.choice(terms))))),
        BoolQ(should=(TermQ(str(rng.choice(terms))), TermQ(str(rng.choice(terms))))),
        BoolQ(must=(TermQ("hot0"),), must_not=(TermQ(str(rng.choice(terms))),)),
    ]
    for q in queries:
        want = oracle.search(q, 10)
        for prune in (True, False):
            got = s.search(q, k=10, prune=prune)
            assert list(got["gid"]) == [g for g, _, _ in want], q
            for gs, (_, _, ws) in zip(got["score"], want):
                assert np.float32(gs) == np.float32(ws), q
