"""PhraseWildcardQuery
(lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
PhraseWildcardQuery.java): a phrase whose positions may hold multi-term
subqueries (prefix / wildcard / regexp / fuzzy / range).

The reference expands each multi-term slot against the term dictionary
under a SHARED ``maxMultiTermExpansions`` budget (java:95-108,179-210,
expansion in TermsEnum = term-ascending order) and matches the result
like a MultiPhraseQuery. This engine rewrites to exactly that: each
multi-term slot becomes its matched-terms set — a PRUNED probe of the
sorted terms Parquet capped at the remaining budget, the same driver
materialization the reference performs per segment — and the whole
query executes as the existing :class:`MultiPhraseQ` kernels (merged
per-slot postings union, exact-position intersect, idf summed over
every expanded entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.query import (
    BoolQ, FuzzyQ, MultiPhraseQ, PhraseQ, PrefixQ, RangeQ, RegexpQ,
    WildcardQ,
)

MULTI_TERM_NODES = (PrefixQ, WildcardQ, RegexpQ, FuzzyQ, RangeQ)


def phrase_wildcard_query(
    searcher,
    slots: "list",
    *,
    max_multi_term_expansions: int = 128,
):
    """Rewrite a wildcard phrase to its execution form.

    ``slots``: one entry per phrase position — a literal term string or
    a multi-term node (PrefixQ / WildcardQ / RegexpQ / FuzzyQ / RangeQ).
    Expansion consumes the shared budget left-to-right in term order
    (PhraseWildcardQuery.java:179-210); a slot with no surviving term
    makes the phrase match nothing (an empty BooleanQuery, the
    reference's noMatchQuery path). All-literal slots collapse to a
    plain PhraseQ."""
    if max_multi_term_expansions < 0:
        raise ValueError("maxMultiTermExpansions must be >= 0")
    remaining = max_multi_term_expansions
    termss: "list[tuple[str, ...]]" = []
    for slot in slots:
        if isinstance(slot, str):
            termss.append((slot,))
            continue
        if not isinstance(slot, MULTI_TERM_NODES):
            raise ValueError(f"unsupported slot type: {type(slot)}")
        rows = (
            searcher.matched_terms_df(slot)
            .select("term")
            .orderBy(F.asc("term"))
            .limit(remaining)
            .collect()
        )
        terms = tuple(r["term"] for r in rows)
        remaining -= len(terms)
        if not terms:
            return BoolQ()  # no expansion -> match nothing
        termss.append(terms)
    offsets = tuple(range(len(termss)))
    if all(len(ts) == 1 for ts in termss):
        return PhraseQ(tuple(ts[0] for ts in termss), offsets)
    return MultiPhraseQ(tuple(termss), offsets)
