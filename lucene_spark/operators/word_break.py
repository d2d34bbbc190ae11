"""WordBreakSpellChecker
(lucene/suggest/src/java/org/apache/lucene/search/spell/
WordBreakSpellChecker.java): fix missing/extra spaces against the term
dictionary.

- ``suggest_word_breaks``: recursively split a term into dictionary
  words (java:238-300): at each split point the LEFT part must clear the
  frequency threshold to recurse; a (left, right) pair both clearing it
  emits a suggestion whose score is the break count; ranked fewer-breaks
  first, then max (or summed) component frequency.
- ``suggest_word_combinations``: concatenate runs of adjacent terms
  (java:145-236) and suggest concatenations present in the dictionary,
  under the same SuggestMode gates.

Spark-first: the reference walks one TermsEnum seek per probe; here
every candidate substring/concatenation is resolved in ONE batched
``Searcher.term_stats`` probe (bounded: O(len^2) substrings / O(n *
maxChanges) windows — driver-sized by construction, like the
reference's own driver-side recursion), then the exact reference
control flow replays over the in-memory freq map, maxEvaluations
accounting included. Results return as DataFrames for composability;
ties beyond the reference's comparators pin to suggestion text asc
(the reference's heap order is unspecified).
"""

from __future__ import annotations

SUGGEST_WHEN_NOT_IN_INDEX = "SUGGEST_WHEN_NOT_IN_INDEX"
SUGGEST_ALWAYS = "SUGGEST_ALWAYS"
SUGGEST_MORE_POPULAR = "SUGGEST_MORE_POPULAR"

NUM_CHANGES_THEN_MAX_FREQUENCY = "NUM_CHANGES_THEN_MAX_FREQUENCY"
NUM_CHANGES_THEN_SUMMED_FREQUENCY = "NUM_CHANGES_THEN_SUMMED_FREQUENCY"


def _substr_freqs(searcher, text: str) -> dict:
    subs = {
        text[i:j]
        for i in range(len(text))
        for j in range(i + 1, len(text) + 1)
    }
    stats = searcher.term_stats(subs)
    return {s: (stats[s][0] if s in stats else 0) for s in subs}


def suggest_word_breaks(
    searcher,
    term: str,
    max_suggestions: int = 10,
    *,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    sort_method: str = NUM_CHANGES_THEN_MAX_FREQUENCY,
    max_changes: int = 1,
    min_break_word_length: int = 1,
    min_suggestion_frequency: int = 1,
    max_evaluations: int = 1000,
):
    """Returns a DataFrame (suggestion, n_words, freq_max, freq_sum)
    ranked per the chosen sort method (suggestWordBreaks,
    java:71-123). ``suggestion`` joins the break words with spaces."""
    spark = searcher.spark
    schema = ("suggestion string, n_words int, freq_max long, "
              "freq_sum long")
    if max_suggestions < 1:
        return spark.createDataFrame([], schema=schema)
    freqs = _substr_freqs(searcher, term)
    orig_freq = freqs.get(term, 0)
    if orig_freq > 0 and suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX:
        return spark.createDataFrame([], schema=schema)
    thr = min_suggestion_frequency
    if suggest_mode == SUGGEST_MORE_POPULAR:
        thr = orig_freq if orig_freq else 1
    min_len = max(1, min_break_word_length)

    out: "list[tuple]" = []  # (words tuple, freqs tuple)
    evals = [0]

    def recurse(text: str, number_breaks: int, prefix: "tuple"):
        # generateBreakUpSuggestions (java:238-300)
        if len(text) < min_len * 2:
            return
        for i in range(min_len, len(text) - min_len + 1):
            if evals[0] >= max_evaluations:
                break
            evals[0] += 1
            left, right = text[:i], text[i:]
            lf = freqs.get(left, 0)
            if lf >= thr:
                rf = freqs.get(right, 0)
                if rf >= thr:
                    words = tuple(w for w, _f in prefix) + (left, right)
                    wfreqs = tuple(f for _w, f in prefix) + (lf, rf)
                    out.append((words, wfreqs))
                if number_breaks + 1 <= max_changes:
                    recurse(right, number_breaks + 1,
                            prefix + ((left, lf),))

    recurse(term, 1, ())
    rows = [
        (" ".join(words), len(words), max(wf), sum(wf))
        for words, wf in out
    ]
    freq_key = 2 if sort_method == NUM_CHANGES_THEN_MAX_FREQUENCY else 3
    rows.sort(key=lambda r: (r[1], -r[freq_key], r[0]))
    return spark.createDataFrame(rows[:max_suggestions], schema=schema)


def suggest_word_combinations(
    searcher,
    terms: "list[str]",
    max_suggestions: int = 10,
    *,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    max_changes: int = 1,
    max_combine_word_length: int = 20,
    min_suggestion_frequency: int = 1,
    max_evaluations: int = 1000,
):
    """Returns a DataFrame (suggestion, start_idx, end_idx, freq,
    score) of dictionary words formed by combining adjacent input
    terms (suggestWordCombinations, java:145-236); score = number of
    combinations (one less than the run length). An empty-string term
    acts as SEPARATOR_TERM (never combined across)."""
    spark = searcher.spark
    schema = ("suggestion string, start_idx int, end_idx int, "
              "freq long, score int")
    if max_suggestions < 1:
        return spark.createDataFrame([], schema=schema)
    # batched probe: originals + every candidate window concatenation
    cands = set(t for t in terms if t)
    for i in range(len(terms) - 1):
        if not terms[i]:
            continue
        combined = terms[i]
        for j in range(i + 1, min(len(terms), i + max_changes + 1)):
            if not terms[j]:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            cands.add(combined)
    stats = searcher.term_stats(cands)
    fr = {t: (stats[t][0] if t in stats else 0) for t in cands}

    orig = None
    if suggest_mode != SUGGEST_ALWAYS:
        orig = [fr.get(t, 0) if t else 0 for t in terms]

    rows: "list[tuple]" = []
    evals = 0
    for i in range(len(terms) - 1):
        if not terms[i]:
            continue
        if len(terms[i]) > max_combine_word_length:
            continue
        max_f = orig[i] if orig is not None else 0
        min_f = orig[i] if orig is not None else (1 << 31) - 1
        combined = terms[i]
        stop = False
        for j in range(i + 1, len(terms)):
            if j - i > max_changes or stop:
                break
            if not terms[j]:
                break
            combined = combined + terms[j]
            if len(combined) > max_combine_word_length:
                break
            if orig is not None:
                max_f = max(max_f, orig[j])
                min_f = min(min_f, orig[j])
            cf = fr.get(combined, 0)
            if (suggest_mode != SUGGEST_MORE_POPULAR or cf >= max_f) and (
                suggest_mode != SUGGEST_WHEN_NOT_IN_INDEX or min_f == 0
            ) and cf >= min_suggestion_frequency:
                rows.append((combined, i, j, cf, j - i))
            evals += 1
            if evals == max_evaluations:
                stop = True
    rows.sort(key=lambda r: (r[4], -r[3], r[0], r[1]))
    return spark.createDataFrame(rows[:max_suggestions], schema=schema)
