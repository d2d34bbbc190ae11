"""ShingleFilter semantics (analysis/common/.../shingle/
ShingleFilter.java): the vectorized stream expansion vs a faithful
per-token replay of the reference loop, including the size-capped
filler runs that only show at size >= 3."""

import random

import numpy as np
import pytest

from lucene_spark.functions.analysis import analyze_batch, shingle_batch


def _replay(terms, positions, size):
    """Reference loop: getNextToken inserts min(posInc-1, size-1)
    fillers before a token whose increment > 1; windows of `size` over
    the resulting stream, all-filler skipped."""
    stream = []
    prev = -1
    for t, p in zip(terms, positions):
        inc = p - prev
        for _ in range(min(inc - 1, size - 1)):
            stream.append(("_", True))
        stream.append((t, False))
        prev = p
    out = []
    for i in range(len(stream) - size + 1):
        win = stream[i:i + size]
        if all(f for _, f in win):
            continue
        out.append(" ".join(t for t, _ in win))
    return out


@pytest.mark.parametrize("size", [2, 3, 4])
def test_shingles_match_replay(size):
    rng = random.Random(size * 17)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "and", "of",
             "to", "scan", "merge", "a", "is"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30)))
        for _ in range(200)
    ]
    texts += ["the and of", "", "the scan", "scan the", "the the scan the"]
    b = analyze_batch(texts)
    di, sh = shingle_batch(b, size)
    got = {}
    for d, s in zip(di, sh):
        got.setdefault(int(d), []).append(str(s))
    ti = np.asarray(b.tok_doc_idx)
    for d in range(len(texts)):
        m = ti == d
        want = _replay(list(b.tok_terms[m]),
                       list(np.asarray(b.tok_positions)[m]), size)
        assert got.get(d, []) == want, (d, texts[d])


def test_long_hole_truncates():
    """'scan the and of to merge': a 4-position hole inserts only
    size-1 fillers (java:358-360)."""
    b = analyze_batch(["scan the and of to merge"])
    _, sh2 = shingle_batch(b, 2)
    assert list(sh2) == ["scan _", "_ merge"]
    _, sh3 = shingle_batch(b, 3)
    # stream at size 3: scan _ _ merge -> windows: scan _ _, _ _ merge
    assert list(sh3) == ["scan _ _", "_ _ merge"]
