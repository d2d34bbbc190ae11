"""Randomized query-tree fuzzing: engine vs the brute-force oracle.

The reference's randomized strategy (TestBooleanQuery / TestWANDScorer /
RandomQueryUtils shape): generate random boolean trees over the fixture
corpus vocabulary — nested booleans, occur-modifier mixes, phrases,
MatchAll negation wrappers, duplicate clauses, missing terms — and assert
the distributed engine returns the SAME ranked docs with float32-identical
scores as the doc-at-a-time :class:`BruteForceIndex`, pruned and
exhaustive.

Today's seed set is fixed, so failures reproduce; widen ``N_TREES`` when
hunting.

Duplicate clauses are capped at one repeat (2x): BooleanQuery.rewrite
merges n duplicates into BoostQuery(c, n) — ONE scorer with weight
float32(n * idf) — while the oracle sums the clause n times. For n a
power of two the two are bit-identical (power-of-2 scaling commutes with
float rounding through the whole BM25 expression); for n=3 they differ in
the last ulp, and the ENGINE (one weighted scorer) is the Lucene-faithful
side, so the oracle only sees power-of-2 duplication.
"""

import os
import random

import numpy as np
import pytest

from lucene_spark.plans.query import BoolQ, MatchAllQ, PhraseQ, TermQ

from .test_index_search import (  # noqa: F401  (fixtures)
    _check_query, corpus_pdf, index_dir, oracle, searcher,
)

N_TREES = int(os.environ.get("LS_FUZZ_TREES", "40"))


def _vocab(oracle):
    by_df = sorted(oracle.postings, key=lambda t: len(oracle.postings[t]))
    # a spread of rare / mid / hot plus guaranteed misses
    picks = [by_df[i] for i in
             (1, 3, len(by_df) // 4, len(by_df) // 2,
              (3 * len(by_df)) // 4, -2, -1)]
    return picks + ["zzznope1", "zzznope2"]


def _gen_leaf(rng, vocab, oracle, allow_phrase=True):
    r = rng.random()
    if allow_phrase and r < 0.2:
        # a real in-corpus bigram half the time, a random (likely
        # non-matching) pair otherwise
        if rng.random() < 0.5:
            g = rng.choice(list(oracle.gids))
            doc_terms = [t for t in vocab[:-2]
                         if g in oracle.postings.get(t, {})]
            if len(doc_terms) >= 2:
                a, b = rng.sample(doc_terms, 2)
            else:
                a, b = rng.sample(vocab[:-2], 2)
        else:
            a, b = rng.sample(vocab, 2)
        return PhraseQ((a, b), (0, 1))
    return TermQ(rng.choice(vocab))


def _gen_wrapper(rng, vocab, oracle):
    """SimpleQueryParser's ``-token``: BQ[SHOULD MatchAll, MUST_NOT b]."""
    branch = _gen_leaf(rng, vocab, oracle, allow_phrase=False)
    return BoolQ(should=(MatchAllQ(),), must_not=(branch,))


def _gen_bool(rng, vocab, oracle, depth):
    def clause():
        r = rng.random()
        if depth > 0 and r < 0.25:
            return _gen_bool(rng, vocab, oracle, depth - 1)
        return _gen_leaf(rng, vocab, oracle)

    must = [clause() for _ in range(rng.randint(0, 2))]
    should = [clause() for _ in range(rng.randint(0, 2))]
    must_not = [_gen_leaf(rng, vocab, oracle)
                for _ in range(rng.randint(0, 2))]
    # MatchAll negation wrappers only at the TOP level (the supported
    # nesting — SimpleQueryParser's output shape)
    if depth == 2:
        for _ in range(rng.randint(0, 1)):
            (must if rng.random() < 0.5 else should).append(
                _gen_wrapper(rng, vocab, oracle))
    # power-of-2 duplication only (see module docstring)
    if should and rng.random() < 0.25:
        should.append(rng.choice(should))
    if must and rng.random() < 0.15:
        must.append(rng.choice(must))
    if not must and not should:
        should.append(_gen_leaf(rng, vocab, oracle))
    return BoolQ(must=tuple(must), should=tuple(should),
                 must_not=tuple(must_not))


def _has_positive(node) -> bool:
    if isinstance(node, BoolQ):
        return any(_has_positive(c) for c in node.must + node.should)
    return True


@pytest.mark.parametrize("seed", range(N_TREES))
def test_random_tree_matches_oracle(searcher, oracle, seed):
    rng = random.Random(1000 + seed)
    vocab = _vocab(oracle)
    node = _gen_bool(rng, vocab, oracle, depth=2)
    if not _has_positive(node):
        node = BoolQ(must=node.must + (TermQ(vocab[3]),),
                     should=node.should, must_not=node.must_not)
    _check_query(searcher, oracle, node, k=10, msg=f"fuzz seed={seed}")
