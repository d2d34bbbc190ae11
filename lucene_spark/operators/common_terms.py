"""CommonTermsQuery (lucene/queries/src/java/org/apache/lucene/queries/
CommonTermsQuery.java).

The reference's rewrite splits the query terms into a LOW-frequency and a
HIGH-frequency group by document frequency against ``maxTermFrequency``
(an absolute docFreq for values >= 1, else a ratio of maxDoc), then
builds::

    BooleanQuery(
        MUST   Boost(BooleanQuery(lowFreqOccur  over low terms,  lowMsm),
                     lowFreqBoost),
        SHOULD Boost(BooleanQuery(highFreqOccur over high terms, highMsm),
                     highFreqBoost))

so rare (selective, cheap) terms drive matching while stopword-class
terms only contribute score — the classic "common terms" optimization
that avoids both a stopword list and a full disjunction over huge
postings.

Spark-first: the classification needs one docFreq per query term —
``Searcher.term_stats`` resolves those from the sorted terms Parquet
(bounded driver probe, |terms| rows, cached per searcher exactly like
Lucene's TermStates snapshot). The returned node is an ordinary nested
``BoolQ`` plan: the searcher's impact-pruned kernels execute it
distributed, and the low-frequency MUST group keeps the candidate set
small — the 100-TB win the reference designed this query for.
"""

from __future__ import annotations

import math

from ..plans.query import BoolQ, BoostQ, TermQ

MUST = "MUST"
SHOULD = "SHOULD"


def _min_should_match(f: float, num_optional: int) -> int:
    """CommonTermsQuery.minNrShouldMatch (java:138-144): values >= 1 or
    == 0 truncate to int; fractions round against the optional-clause
    count (Java Math.round = floor(x + 0.5))."""
    if f >= 1.0 or f == 0.0:
        return int(f)
    return math.floor(f * num_optional + 0.5)


def _group(terms: list, occur: str, msm: int) -> BoolQ:
    if occur == MUST:
        return BoolQ(must=tuple(terms))
    return BoolQ(should=tuple(terms), msm=msm)


def common_terms_query(
    searcher,
    terms: "list[str] | tuple[str, ...]",
    *,
    max_term_frequency: float = 0.01,
    low_freq_occur: str = SHOULD,
    high_freq_occur: str = SHOULD,
    low_freq_boost: float = 1.0,
    high_freq_boost: float = 1.0,
    low_freq_min_should_match: float = 0.0,
    high_freq_min_should_match: float = 0.0,
):
    """Rewrite a CommonTermsQuery to its boolean plan
    (CommonTermsQuery.java:105-204 rewrite + buildQuery).

    Returns a plans.query node for ``searcher.search``. Semantics pinned
    to the reference:

    - no terms -> MatchNoDocs (an empty BoolQ); one term -> plain TermQ
      (java:107-111);
    - a term is HIGH frequency when ``docFreq > maxTermFrequency`` (if
      the threshold is an absolute count >= 1) or ``docFreq >
      ceil(float32(maxTermFrequency) * float32(maxDoc))`` (java:154-156,
      float math included); terms absent from the index are LOW
      (java:152-153);
    - when every term is high-frequency the high group upgrades to a
      MUST conjunction (unless an msm or explicit MUST already binds
      it), "to prevent slow queries" (java:176-184);
    - group msm applies only to SHOULD groups, fractional values
      rounding against the group size (java:169-174).
    """
    if low_freq_occur == "MUST_NOT" or high_freq_occur == "MUST_NOT":
        raise ValueError(
            "lowFreqOccur/highFreqOccur must be MUST or SHOULD"
        )
    terms = list(terms)
    if not terms:
        return BoolQ()  # MatchNoDocsQuery
    if len(terms) == 1:
        return TermQ(terms[0])

    stats = searcher.term_stats(set(terms))
    max_doc = int(searcher.stats["n_rows"])
    # java:155: (int) Math.ceil(maxTermFrequency * (float) maxDoc) — the
    # multiply happens in float32
    import numpy as np

    ratio_cut = int(math.ceil(float(
        np.float32(max_term_frequency) * np.float32(max_doc)
    )))
    low: list = []
    high: list = []
    for t in terms:
        st = stats.get(t)
        if st is None:
            low.append(TermQ(t))  # absent term: low group (java:152)
        elif ((max_term_frequency >= 1.0 and st[0] > max_term_frequency)
                or st[0] > ratio_cut):
            high.append(TermQ(t))
        else:
            low.append(TermQ(t))

    low_msm = (_min_should_match(low_freq_min_should_match, len(low))
               if low_freq_occur == SHOULD and low else 0)
    high_msm = (_min_should_match(high_freq_min_should_match, len(high))
                if high_freq_occur == SHOULD and high else 0)
    if not low and high_msm == 0 and high_freq_occur != MUST:
        high_freq_occur = MUST  # java:176-184 conjunction upgrade

    must: list = []
    should: list = []
    if low:
        must.append(BoostQ(_group(low, low_freq_occur, low_msm),
                           float(low_freq_boost)))
    if high:
        should.append(BoostQ(_group(high, high_freq_occur, high_msm),
                             float(high_freq_boost)))
    return BoolQ(must=tuple(must), should=tuple(should)).simplified()
