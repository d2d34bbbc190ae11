"""Byte-pair encoding over a real merges table.

The reference has no BPE (token accounting is an LLM-pipeline op, not a
Lucene one); the algorithms here are the public ones:

  - training: Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of
    Rare Words with Subword Units", arXiv:1508.07909) — repeatedly merge the
    most frequent adjacent symbol pair over a word-frequency table;
  - application: the GPT-2 ``encoder.py`` loop (openai/gpt-2, public) — for
    each pre-tokenized piece, repeatedly merge the present pair with the
    LOWEST merge rank until no ranked pair remains.

The merges table shipped in ``bpe_merges.txt`` is trained deterministically
(ties broken to the lexicographically smallest pair) on the sf0.001
synthetic corpus; regenerate with ``python -m lucene_spark.functions.bpe``.
The table is capped at 48 merges (the vocab-size hyperparameter): the
synthetic vocabulary is small enough that an uncapped run merges every word
whole, and a cap keeps rarer words at genuine subword granularity.

Equivalence note for the SQL oracle: for any VALID merges table (one a real
training run produces), applying merges as a single pass of leftmost
replace-all per rank, in rank order, yields the same tokenization as the
rank-priority loop above. A pair learned at rank r can only be built from
symbols created at ranks < r (a symbol has exactly one creating merge, and
both sides of a pair must exist before the pair can be counted), and merging
rank r never creates a new occurrence of any pair of rank <= r (the merged
symbol is strictly longer than either side). So by induction over ranks the
two schedules produce identical symbol sequences — which lets the DuckDB
twin evaluate BPE as a rank-indexed chain of ``replace(s, 'a b', 'ab')``
steps in a recursive CTE. ``tests/test_textops.py`` pins the equivalence on
the real corpus.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache
from pathlib import Path

# pre-tokenizer: letter runs, digit runs, single other non-space chars —
# the GPT-2 regex's shape reduced to this corpus's alphabet
BPE_PIECE_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")

MERGES_PATH = Path(__file__).with_name("bpe_merges.txt")


def train_bpe(texts, n_merges: int = 256) -> "list[tuple[str, str]]":
    """Sennrich-style training: count adjacent symbol pairs weighted by
    piece frequency; merge the most frequent pair (ties: lexicographically
    smallest pair, for determinism); repeat ``n_merges`` times or until no
    pair repeats."""
    piece_freq: Counter = Counter()
    for t in texts:
        for piece in BPE_PIECE_RE.findall(t):
            piece_freq[tuple(piece)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, f in piece_freq.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break  # no repeated pair left — further merges memorize noise
        merges.append(best)
        a, b = best
        merged = a + b
        nxt: Counter = Counter()
        for word, f in piece_freq.items():
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            nxt[tuple(out)] += f
        piece_freq = nxt
    return merges


def save_merges(merges: "list[tuple[str, str]]", path: Path = MERGES_PATH) -> None:
    lines = ["#version: lucene_spark bpe merges (rank order; 'left right')"]
    lines += [f"{a} {b}" for a, b in merges]
    path.write_text("\n".join(lines) + "\n")


def load_merges(path: Path = MERGES_PATH) -> "list[tuple[str, str]]":
    out: list[tuple[str, str]] = []
    for line in path.read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        a, _, b = line.partition(" ")
        out.append((a, b))
    return out


def load_ranks(path: Path = MERGES_PATH) -> "dict[tuple[str, str], int]":
    return {pair: r for r, pair in enumerate(load_merges(path))}


def make_bpe(ranks: "dict[tuple[str, str], int]"):
    """A memoized piece -> symbol-tuple tokenizer (the GPT-2 apply loop).
    Build one per task; the lru_cache makes Zipf-hot pieces O(1). The ranks
    dict rides the task closure — fine at this table size (256 pairs); a
    GPT-2-scale table (50k) should go through a Spark broadcast instead."""
    inf = float("inf")

    @lru_cache(maxsize=1 << 16)
    def bpe(piece: str) -> "tuple[str, ...]":
        word = tuple(piece)
        while len(word) > 1:
            best = min(
                ((word[i], word[i + 1]) for i in range(len(word) - 1)),
                key=lambda p: ranks.get(p, inf),
            )
            if best not in ranks:
                break
            a, b = best
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        return word

    return bpe


def count_tokens(text: str, bpe) -> int:
    """Total BPE tokens for a document: pre-tokenize, BPE each piece."""
    return sum(len(bpe(p)) for p in BPE_PIECE_RE.findall(text))


if __name__ == "__main__":
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train_bpe(texts, n_merges=48)
    save_merges(merges)
    print(f"wrote {len(merges)} merges to {MERGES_PATH}")
