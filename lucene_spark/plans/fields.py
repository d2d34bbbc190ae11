"""Field-scoped term keys.

Lucene's data model is per-field postings: FieldInfos unions the fields at
flush and every postings/norms/stats structure is keyed by (field, term)
(``core/index/FieldInfos.java``, ``core/index/IndexOptions.java``). The
Spark engine keeps ONE physical term column and scopes it by key
qualification: the default field's terms are stored bare (so single-field
indexes — the common case — are unchanged on disk), and any other field's
terms are stored as ``field + \\x1f + term``.

\\x1f (unit separator) cannot appear in analyzed terms (the tokenizer only
emits word/number runs), so qualified keys never collide with bare terms,
``startswith(field + sep)`` is a perfect field filter, and lexicographic
term order within a field is preserved (the sorted terms-table seek still
works per field).

Per-field *norms* need no extra machinery: norm bytes ride inside each
term's block rows and were computed from that field's own doc lengths at
invert time. Per-field *collection stats* (docCount, sumTotalTermFreq →
idf/avgdl) live in ``stats.json["fields"]``.
"""

from __future__ import annotations

DEFAULT_FIELD = "text"
FIELD_SEP = "\x1f"


def qualify(field: str, term: str) -> str:
    """Physical term key for (field, term)."""
    if field == DEFAULT_FIELD:
        return term
    return f"{field}{FIELD_SEP}{term}"


def field_of(term_key: str) -> str:
    """Field a physical term key belongs to."""
    i = term_key.find(FIELD_SEP)
    return DEFAULT_FIELD if i < 0 else term_key[:i]


def local_term(term_key: str) -> str:
    """The bare (field-local) term of a physical key."""
    i = term_key.find(FIELD_SEP)
    return term_key if i < 0 else term_key[i + 1 :]
