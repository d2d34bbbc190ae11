"""DuckDB oracle SQL for the training-data pipeline operators (textops).

Every expression mirrors the Spark plan value-for-value:

  - hashes are md5-derived: Spark ``conv(substr(md5(s),1,15),16,10)`` ==
    DuckDB ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)`` (verified bit-equal);
  - MinHash mixes mod BEFORE multiply so int64 never overflows on either
    engine: ``((h % p) * a + b) % p`` with p = 2^31 - 1;
  - doubles come from identical integer inputs through identical expression
    shapes (single divisions, left-fold sums in array order), so float
    comparisons are exact, not approximate;
  - the dot-product fold: Spark ``F.aggregate(zip_with(a,b,*), 0.0, +)`` is a
    left fold with 0.0 init; DuckDB ``list_reduce`` left-folds from the first
    element — identical because 0.0 + v == v exactly.
"""

from __future__ import annotations

from ..operators.textops import (
    BPE_TOKEN_RE,
    LANG_STOPS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_MINHASH,
    lsh_plane_sign,
)
from .oracle_sql import STOPLIST_SQL


def md5i(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# raw whitespace tokens with compact 1-based positions (textops._toks analog:
# split on ' ', drop empties, keep order)
TOKS_CTE = """
rtoks AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  )
  WHERE tok <> ''
)"""


def shingle_cte(name: str, k: int) -> str:
    """Space-joined k-gram shingles per doc (textops._shingles analog)."""
    aliases = [chr(ord("a") + i) for i in range(k)]
    joins = "".join(
        f"\n  JOIN rtoks {aliases[i]} ON {aliases[i]}.doc_id = a.doc_id"
        f" AND {aliases[i]}.pos = a.pos + {i}"
        for i in range(1, k)
    )
    concat = " || ' ' || ".join(f"{al}.tok" for al in aliases)
    return f"""
{name} AS (
  SELECT a.doc_id, {concat} AS sh
  FROM rtoks a{joins}
)"""


def dedup_exact_sql() -> str:
    return f"""WITH d AS (
  SELECT doc_id, {md5i('text')} AS h FROM documents
),
c AS (
  SELECT h, min(doc_id) AS canonical_id, count(*)::BIGINT AS group_size
  FROM d GROUP BY h
)
SELECT d.doc_id, c.canonical_id,
       d.doc_id <> c.canonical_id AS is_duplicate, c.group_size
FROM d JOIN c USING (h)
ORDER BY d.doc_id"""


COEF_CTE = "coef(i, a, b) AS (VALUES " + ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
) + ")"


def _sig_ctes(k: int = 3) -> str:
    return f"""{TOKS_CTE},{shingle_cte('sh', k)},
shd AS (SELECT DISTINCT doc_id, sh FROM sh),
shh AS (SELECT doc_id, {md5i('sh')} % {MINHASH_P} AS h FROM shd),
{COEF_CTE},
sig AS (
  SELECT doc_id, i,
         min(((h * a) + b) % {MINHASH_P})::BIGINT AS sig
  FROM shh CROSS JOIN coef
  GROUP BY doc_id, i
)"""


def minhash_signatures_sql() -> str:
    return f"""WITH {_sig_ctes()}
SELECT doc_id, i::INT AS i, sig FROM sig ORDER BY doc_id, i"""


def minhash_lsh_pairs_sql(bands: int = 4) -> str:
    """Star pairs per band bucket (bucket-min doc ↔ member): linear in
    bucket size, components preserved — the textops star semantics."""
    rpb = N_MINHASH // bands
    return f"""WITH {_sig_ctes()},
keys AS (
  SELECT doc_id, (i // {rpb})::INT AS band,
         string_agg(CAST(sig AS VARCHAR), '_' ORDER BY i) AS bkey
  FROM sig GROUP BY doc_id, i // {rpb}
),
bmin AS (
  SELECT band, bkey, min(doc_id) AS doc_a
  FROM keys GROUP BY band, bkey HAVING count(*) > 1
)
SELECT DISTINCT bm.doc_a, k.doc_id AS doc_b
FROM bmin bm JOIN keys k
  ON k.band = bm.band AND k.bkey = bm.bkey AND k.doc_id > bm.doc_a
ORDER BY doc_a, doc_b"""


def ngram_jaccard_pairs_sql(threshold: float = 0.8, k: int = 3) -> str:
    return f"""WITH {TOKS_CTE},{shingle_cte('sh', k)},
shd AS (SELECT DISTINCT doc_id, sh FROM sh),
shh AS (SELECT doc_id, {md5i('sh')} AS h FROM shd),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb,
       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= {threshold}
ORDER BY doc_a, doc_b"""


def ngram_jaccard_lsh_sql(threshold: float = 0.5, bands: int = 4, k: int = 3) -> str:
    """Exact Jaccard restricted to banded-LSH candidate pairs (the gated
    scale path of ``textops.ngram_jaccard_lsh``)."""
    rpb = N_MINHASH // bands
    return f"""WITH {_sig_ctes(k)},
keys AS (
  SELECT doc_id, (i // {rpb})::INT AS band,
         string_agg(CAST(sig AS VARCHAR), '_' ORDER BY i) AS bkey
  FROM sig GROUP BY doc_id, i // {rpb}
),
bmin AS (
  SELECT band, bkey, min(doc_id) AS doc_a
  FROM keys GROUP BY band, bkey HAVING count(*) > 1
),
cand AS (
  SELECT DISTINCT bm.doc_a, k.doc_id AS doc_b
  FROM bmin bm JOIN keys k
    ON k.band = bm.band AND k.bkey = bm.bkey AND k.doc_id > bm.doc_a
),
shf AS (SELECT doc_id, {md5i('sh')} AS h FROM shd),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS inter
  FROM cand c
  JOIN shf fa ON fa.doc_id = c.doc_a
  JOIN shf fb ON fb.doc_id = c.doc_b AND fb.h = fa.h
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb,
       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= {threshold}
ORDER BY doc_a, doc_b"""


def repetition_stats_sql(k: int = 3) -> str:
    """Within-doc duplicate/top k-gram fractions (quality-rule oracle)."""
    return f"""WITH {TOKS_CTE},{shingle_cte('sh', k)},
per AS (
  SELECT doc_id, sh AS g, count(*)::BIGINT AS c FROM sh GROUP BY doc_id, sh
),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_uniq,
         max(c)::BIGINT AS top
  FROM per GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n, 0)::BIGINT AS n_grams,
       COALESCE(a.n - a.n_uniq, 0)::BIGINT AS n_dup_grams,
       COALESCE(CAST(a.n - a.n_uniq AS DOUBLE) / a.n, 0.0) AS dup_gram_ratio,
       COALESCE(CAST(a.top AS DOUBLE) / a.n, 0.0) AS top_gram_ratio
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
ORDER BY d.doc_id"""


def contamination_check_sql(probe_doc_ids: "list[int]", k: int = 5) -> str:
    ids = ", ".join(str(int(i)) for i in probe_doc_ids)
    return f"""WITH {TOKS_CTE},{shingle_cte('shc', k)},
shd AS (SELECT DISTINCT doc_id, sh FROM shc),
shh AS (SELECT doc_id, {md5i('sh')} AS h FROM shd),
probes AS (SELECT DISTINCT h FROM shh WHERE doc_id IN ({ids}))
SELECT s.doc_id, count(*)::BIGINT AS n_shared_grams
FROM shh s JOIN probes p ON p.h = s.h
WHERE s.doc_id NOT IN ({ids})
GROUP BY s.doc_id ORDER BY s.doc_id"""


def stratified_sample_sql(rates: "dict[str, float]", buckets: int = 1000) -> str:
    thresh = "0"
    for lang, rate in sorted(rates.items()):
        thresh = f"CASE WHEN lang = '{lang}' THEN {int(rate * buckets)} ELSE {thresh} END"
    bucket = f"{md5i('CAST(doc_id AS VARCHAR)')} % {buckets}"
    return f"""SELECT doc_id, lang, ({bucket})::BIGINT AS bucket
FROM documents
WHERE ({bucket}) < ({thresh})
ORDER BY doc_id"""


def dedup_clusters_sql(bands: int = 4, k: int = 3) -> str:
    """Connected components over exact-dup + LSH candidate edges via a
    recursive reachability CTE; cluster id = min doc_id reachable."""
    rpb = N_MINHASH // bands
    return f"""WITH RECURSIVE {_sig_ctes(k)},
keys AS (
  SELECT doc_id, (i // {rpb})::INT AS band,
         string_agg(CAST(sig AS VARCHAR), '_' ORDER BY i) AS bkey
  FROM sig GROUP BY doc_id, i // {rpb}
),
bmin AS (
  SELECT band, bkey, min(doc_id) AS mn
  FROM keys GROUP BY band, bkey HAVING count(*) > 1
),
lsh_pairs AS (
  SELECT DISTINCT bm.mn AS a, k.doc_id AS b
  FROM bmin bm JOIN keys k
    ON k.band = bm.band AND k.bkey = bm.bkey AND k.doc_id > bm.mn
),
texth AS (SELECT doc_id, {md5i('text')} AS h FROM documents),
exact_pairs AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b
  FROM texth t1 JOIN texth t2 ON t1.h = t2.h AND t1.doc_id < t2.doc_id
),
edges AS (
  SELECT a, b FROM lsh_pairs UNION SELECT a, b FROM exact_pairs
  UNION SELECT b, a FROM lsh_pairs UNION SELECT b, a FROM exact_pairs
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT e.a AS doc_id, r.label
  FROM edges e JOIN reach r ON r.doc_id = e.b
)
SELECT doc_id, min(label)::BIGINT AS cluster_id,
       (doc_id <> min(label)) AS is_duplicate
FROM reach GROUP BY doc_id ORDER BY doc_id"""


def quality_filter_sql(
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_tok: float = 3.0,
    max_mean_tok: float = 5.0,
    min_stop_ratio: float = 0.04,
    max_dup_gram_ratio: float = 0.05,
    max_top_gram_ratio: float = 0.10,
) -> str:
    """Twin of textops.quality_filter: thresholds applied to the exact same
    doubles the text_stats/repetition_stats oracles produce, so the boolean
    comparisons are deterministic on both engines."""
    return f"""SELECT st.doc_id,
       (st.n_tokens >= {min_tokens} AND st.n_tokens <= {max_tokens}) AS len_ok,
       coalesce(st.mean_token_len >= {min_mean_tok} AND st.mean_token_len <= {max_mean_tok}, FALSE) AS tok_len_ok,
       coalesce(st.stopword_ratio >= {min_stop_ratio}, FALSE) AS stop_ok,
       (rp.dup_gram_ratio <= {max_dup_gram_ratio} AND rp.top_gram_ratio <= {max_top_gram_ratio}) AS rep_ok,
       (len_ok AND tok_len_ok AND stop_ok AND rep_ok) AS keep
FROM ({text_stats_sql()}) st JOIN ({repetition_stats_sql(k=3)}) rp USING (doc_id)
ORDER BY st.doc_id"""


def dedup_keep_sql(bands: int = 4, k: int = 3) -> str:
    """Twin of textops.dedup_keep: canonical survivors + represented count,
    derived from the same recursive-CTE clusters as dedup_clusters_sql."""
    return f"""SELECT cluster_id AS doc_id, count(*)::BIGINT AS n_represented
FROM ({dedup_clusters_sql(bands=bands, k=k)}) cl
GROUP BY cluster_id ORDER BY doc_id"""


def simhash_sql(bits: int = 16) -> str:
    bits_cte = "bits(b) AS (VALUES " + ", ".join(f"({b})" for b in range(bits)) + ")"
    return f"""WITH {TOKS_CTE},
th AS (SELECT doc_id, {md5i('tok')} AS h FROM rtoks),
{bits_cte},
v AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vb
  FROM th CROSS JOIN bits
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN vb > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
FROM v GROUP BY doc_id ORDER BY doc_id"""


def text_stats_sql() -> str:
    return f"""WITH {TOKS_CTE},
s AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_tokens,
         count(DISTINCT tok)::BIGINT AS n_unique,
         count(*) FILTER (tok IN ({STOPLIST_SQL}))::BIGINT AS n_stopwords,
         sum(length(tok))::BIGINT AS total_chars
  FROM rtoks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(s.n_unique, 0)::BIGINT AS n_unique,
       coalesce(s.n_stopwords, 0)::BIGINT AS n_stopwords,
       CAST(s.n_unique AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS type_token_ratio,
       CAST(s.total_chars AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS mean_token_len,
       CAST(s.n_stopwords AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS stopword_ratio,
       CAST(s.n_stopwords AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) >= 0.15 AS lang_en_guess
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id"""


def pii_scrub_sql() -> str:
    """PII-scrub twin: same injected synthetic PII, same three patterns in
    the same order (RE2 'g' flag = Spark's replace-all default)."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    phone = "\\+[0-9][0-9 ()-]{6,14}[0-9]"
    return f"""WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 or +1415555' || printf('%04d', doc_id % 10000) AS t
  FROM documents
),
e AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{email}'))::BIGINT AS n_emails,
         regexp_replace(t, '{email}', '<EMAIL>', 'g') AS t
  FROM aug
),
i AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t, '{ipv4}'))::BIGINT AS n_ips,
         regexp_replace(t, '{ipv4}', '<IP>', 'g') AS t
  FROM e
)
SELECT doc_id,
       regexp_replace(t, '{phone}', '<PHONE>', 'g') AS clean_text,
       n_emails, n_ips,
       len(regexp_extract_all(t, '{phone}'))::BIGINT AS n_phones
FROM i ORDER BY doc_id"""


def normalize_text_sql() -> str:
    """Normalization twin: lowercase, non-alphanumeric runs to one space,
    trim; md5 over the SAME normalized string."""
    return """WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text, md5(norm_text) AS norm_md5
FROM n ORDER BY doc_id"""


def edge_ngrams_sql(min_g: int = 2, max_g: int = 4) -> str:
    """EdgeNGram(min, max, preserveOriginal=True) vocabulary twin: the
    filter's gram list is pure prefix algebra, stated directly in SQL."""
    return f"""WITH t AS (
  SELECT DISTINCT tok AS term FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> '' AND tok NOT IN ({STOPLIST_SQL})
),
short AS (
  SELECT term, 0 AS ord, term AS gram FROM t WHERE length(term) < {min_g}
),
pre AS (
  SELECT term, g - {min_g} AS ord, substr(term, 1, g::INT) AS gram
  FROM t, generate_series({min_g}, {max_g}) AS gs(g)
  WHERE length(term) >= {min_g} AND g <= least({max_g}, length(term))
),
orig AS (
  SELECT term, least({max_g}, length(term)) - {min_g} + 1 AS ord,
         term AS gram
  FROM t WHERE length(term) > {max_g}
)
SELECT term, ord::BIGINT AS ord, gram
FROM (SELECT * FROM short UNION ALL SELECT * FROM pre
      UNION ALL SELECT * FROM orig)
ORDER BY term, ord"""


def mapping_filter_sql() -> str:
    """MappingCharFilter twin: the gate's patterns are mutually
    non-overlapping with pattern-free outputs, so sequential global
    replaces equal the greedy longest-match single pass."""
    return """SELECT doc_id,
       replace(replace(replace(text,
           'scan', 'sweep'), 'merge', 'combine'), 'window', 'pane')
           AS mapped
FROM documents ORDER BY doc_id"""


def html_extract_sql() -> str:
    """HTML-extraction twin: the synthetic page framing is invertible, so
    the oracle states the expected stripped output directly from `text`
    (the Spark side runs the real HTMLStripCharFilter kernel, NOT this
    formula — the comparison is the check).

    Even docs: <html><head><title>t</title></head><body><p> … strips to
    3 newlines + 't' + 4 newlines; each space became </p><p> (2 newlines);
    tail </p></body></html> is 3 newlines.  Odd docs: 3 leading newlines,
    each space became '&nbsp;</p>\\n<p>' (space + 3 newlines), tail
    </p><script>…</script></body></html> is 4 newlines (script content is
    elided, the element substitutes one newline)."""
    return """SELECT doc_id,
       CASE WHEN doc_id % 2 = 0
            THEN repeat(chr(10), 3) || 't' || repeat(chr(10), 4)
                 || replace(text, ' ', repeat(chr(10), 2))
                 || repeat(chr(10), 3)
            ELSE repeat(chr(10), 3)
                 || replace(text, ' ', ' ' || repeat(chr(10), 3))
                 || repeat(chr(10), 4)
       END AS extracted
FROM documents ORDER BY doc_id"""


def doc_fingerprints_sql(k: int = 5) -> str:
    return f"""WITH {TOKS_CTE},{shingle_cte('sh', k)},
shh AS (SELECT doc_id, {md5i('sh')} AS h FROM sh)
SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max, count(*)::BIGINT AS n_shingles
FROM shh GROUP BY doc_id ORDER BY doc_id"""


def cross_doc_dup_ngrams_sql(k: int = 5) -> str:
    """Twin of textops.cross_doc_dup_ngrams: occurrence-weighted cross-doc
    duplicated k-gram fraction. dup/n are BIGINT from identical gram sets on
    both engines; the single BIGINT->DOUBLE division makes the frac exact."""
    return f"""WITH {TOKS_CTE},{shingle_cte('sh', k)},
hsh AS (SELECT doc_id, {md5i('sh')} AS h FROM sh),
occ AS (SELECT doc_id, h, count(*)::BIGINT AS c FROM hsh GROUP BY doc_id, h),
dfreq AS (SELECT h, count(*)::BIGINT AS n_docs FROM occ GROUP BY h),
agg AS (
  SELECT o.doc_id, sum(o.c)::BIGINT AS n,
         sum(CASE WHEN f.n_docs >= 2 THEN o.c ELSE 0 END)::BIGINT AS dup
  FROM occ o JOIN dfreq f USING (h) GROUP BY o.doc_id
)
SELECT d.doc_id,
       coalesce(a.n, 0)::BIGINT AS n_grams,
       coalesce(a.dup, 0)::BIGINT AS n_cross_dup_grams,
       coalesce(CAST(a.dup AS DOUBLE) / a.n, 0.0) AS cross_dup_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id"""


def dedup_spans_sql(k: int = 5) -> str:
    """Twin of textops.dedup_spans: cleaned corpus with cross-doc duplicated
    k-gram spans removed — the lowest-doc_id document containing a gram
    keeps its copy; all other occurrences drop their k tokens. Token
    positions are engine-internal (1-based here, 0-based in Spark) — only
    the kept-token order matters, and string_agg(... ORDER BY pos) equals
    Spark's array_sort-by-j reassembly."""
    aliases = [chr(ord("a") + i) for i in range(k)]
    joins = "".join(
        f"\n  JOIN rtoks {aliases[i]} ON {aliases[i]}.doc_id = a.doc_id"
        f" AND {aliases[i]}.pos = a.pos + {i}"
        for i in range(1, k)
    )
    concat = " || ' ' || ".join(f"{al}.tok" for al in aliases)
    return f"""WITH {TOKS_CTE},
grams AS (
  SELECT a.doc_id, a.pos AS p, {md5i(f"({concat})")} AS h
  FROM rtoks a{joins}
),
stats AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keeper
  FROM grams GROUP BY h
),
covered AS (
  SELECT DISTINCT g.doc_id, g.p + ofs.o AS pos
  FROM grams g
  JOIN stats s ON g.h = s.h AND s.n_docs >= 2 AND g.doc_id <> s.keeper
  CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS o) ofs
),
kept AS (
  SELECT r.doc_id, r.pos, r.tok
  FROM rtoks r
  ANTI JOIN covered c ON r.doc_id = c.doc_id AND r.pos = c.pos
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS kept_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
),
ntok AS (SELECT doc_id, count(*)::BIGINT AS n_tokens FROM rtoks GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.kept_text, '') AS clean_text,
       coalesce(nt.n_tokens, 0)::BIGINT AS n_tokens,
       (coalesce(nt.n_tokens, 0) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM documents d
LEFT JOIN ntok nt ON nt.doc_id = d.doc_id
LEFT JOIN agg a ON a.doc_id = d.doc_id
ORDER BY d.doc_id"""


def token_counts_sql() -> str:
    """Real-BPE twin: replay the committed merges table as a rank-ordered
    chain of leftmost replace-all steps over the space-separated symbol
    string of each DISTINCT piece (|vocab| x n_merges rows, not
    |corpus-tokens| x n_merges) — equivalent to the kernel's rank-priority
    loop for any valid merges table (proof: functions/bpe.py docstring)."""
    from ..functions.bpe import load_merges

    merges = load_merges()
    vals = ", ".join(
        "({}, '{} {}', '{}{}')".format(
            r, a.replace("'", "''"), b.replace("'", "''"),
            a.replace("'", "''"), b.replace("'", "''"),
        )
        for r, (a, b) in enumerate(merges)
    )
    return f"""WITH RECURSIVE {TOKS_CTE},
merges AS (SELECT * FROM (VALUES {vals}) AS v(r, pat, rep)),
ws AS (SELECT doc_id, count(*)::BIGINT AS ws_tokens FROM rtoks GROUP BY doc_id),
pieces AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS piece
  FROM documents
),
uniq AS (SELECT DISTINCT piece FROM pieces),
steps AS (
  SELECT piece, 0 AS r, trim(regexp_replace(piece, '(.)', '\\1 ', 'g')) AS s
  FROM uniq
  UNION ALL
  SELECT st.piece, st.r + 1, replace(st.s, m.pat, m.rep)
  FROM steps st JOIN merges m ON m.r = st.r
),
plen AS (
  SELECT piece, len(string_split(s, ' '))::BIGINT AS ntok
  FROM steps WHERE r = {len(merges)}
),
bp AS (
  SELECT p.doc_id, SUM(pl.ntok)::BIGINT AS bpe_tokens
  FROM pieces p JOIN plen pl USING (piece) GROUP BY p.doc_id
)
SELECT d.doc_id, ws.ws_tokens,
       COALESCE(bp.bpe_tokens, 0)::BIGINT AS bpe_tokens
FROM documents d
JOIN ws ON ws.doc_id = d.doc_id
LEFT JOIN bp ON bp.doc_id = d.doc_id
ORDER BY d.doc_id"""


def lang_id_sql() -> str:
    langs = list(LANG_STOPS)
    langs_cte = "langs(lang, pri) AS (VALUES " + ", ".join(
        f"('{lang}', {len(langs) - i})" for i, lang in enumerate(langs)
    ) + ")"
    lw_cte = "lw(lang, w) AS (VALUES " + ", ".join(
        f"('{lang}', '{w}')" for lang in langs for w in LANG_STOPS[lang]
    ) + ")"
    return f"""WITH {TOKS_CTE},
{langs_cte},
{lw_cte},
nt AS (
  SELECT d.doc_id, coalesce(x.n, 0)::BIGINT AS n
  FROM documents d LEFT JOIN (
    SELECT doc_id, count(*)::BIGINT AS n FROM rtoks GROUP BY doc_id
  ) x USING (doc_id)
),
h AS (
  SELECT t.doc_id, lw.lang, count(*)::BIGINT AS c
  FROM rtoks t JOIN lw ON t.tok = lw.w
  GROUP BY t.doc_id, lw.lang
),
r AS (
  SELECT nt.doc_id, l.lang, l.pri,
         COALESCE(CAST(COALESCE(h.c, 0) AS DOUBLE) / CAST(nt.n AS DOUBLE), 0.0) AS ratio
  FROM nt CROSS JOIN langs l
  LEFT JOIN h ON h.doc_id = nt.doc_id AND h.lang = l.lang
),
b AS (
  SELECT doc_id, lang, ratio,
         row_number() OVER (PARTITION BY doc_id ORDER BY ratio DESC, pri DESC) AS rn
  FROM r
)
SELECT doc_id, lang AS lang_pred, ratio AS lang_score
FROM b WHERE rn = 1 ORDER BY doc_id"""


# ------------------------------------------------------- similarity search

DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"
)


def _cos(a: str, b: str) -> str:
    return (
        f"{DOT.format(a=a, b=b)} / (sqrt({DOT.format(a=a, b=a)})"
        f" * sqrt({DOT.format(a=b, b=b)}))"
    )


def ann_cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}
)
SELECT vec_id, {_cos('embedding', 'qv')} AS cos
FROM embeddings CROSS JOIN q
WHERE vec_id <> {query_vec_id}
ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def _bucket_sql(vec: str, dim: int, n_planes: int) -> str:
    """Literal LSH bucket expression; same left-fold order as _bucket_bits."""
    plane_terms = []
    for p in range(n_planes):
        comps = " + ".join(
            f"CAST({vec}[{i + 1}] AS DOUBLE) * {lsh_plane_sign(p, i)}"
            for i in range(dim)
        )
        plane_terms.append(f"CASE WHEN ({comps}) > 0 THEN {1 << p} ELSE 0 END")
    return "CAST(" + " + ".join(plane_terms) + " AS INT)"


def ann_lsh_topk_sql(
    query_vec_id: int = 0, k: int = 10, n_planes: int = 8, dim: int = 64
) -> str:
    bucket = _bucket_sql("embedding", dim, n_planes)
    return f"""WITH eb AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS (SELECT embedding AS qv, bucket AS qbucket FROM eb WHERE vec_id = {query_vec_id})
SELECT vec_id, {_cos('embedding', 'qv')} AS cos
FROM eb CROSS JOIN q
WHERE bucket = qbucket AND vec_id <> {query_vec_id}
ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


# ------------------------------------------------------- multimodal plumbing
# The queries() entries derive the opaque media payload deterministically as
# the UTF-8 bytes of `text`; the corpus is pure ASCII (verified per SF), so
# per-char ord() == per-byte value and the byte-level ops are SQL-expressible.


def media_metadata_sql() -> str:
    from ..operators.multimodal import _MAGIC

    mtype = "'unknown'"
    for prefix, name in _MAGIC:
        mtype = (
            f"CASE WHEN starts_with(hex(encode(substr(text, 1, 4))),"
            f" '{prefix.upper()}') THEN '{name}' ELSE {mtype} END"
        )
    return f"""SELECT doc_id,
       octet_length(encode(text))::BIGINT AS byte_len,
       md5(text) AS content_md5,
       {mtype} AS media_type
FROM documents ORDER BY doc_id"""


CHARS_CTE = """
chars AS (
  SELECT doc_id, ord(ch) AS b
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
)"""


def image_decode_sql() -> str:
    # mirrors multimodal._fake_decode on the UTF-8 payload of `text`
    return f"""WITH {CHARS_CTE},
m AS (SELECT doc_id, sum(b)::BIGINT AS s, count(*)::BIGINT AS n FROM chars GROUP BY doc_id)
SELECT d.doc_id,
       (ord(substr(d.text, 1, 1)) % 64 + 1)::INT AS width,
       (ord(substr(d.text, CASE WHEN length(d.text) > 1 THEN 2 ELSE 1 END, 1)) % 64 + 1)::INT AS height,
       3::INT AS channels,
       CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean_value,
       'fake' AS decoder
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY d.doc_id"""


def byte_histogram_sql(n_bins: int = 16) -> str:
    cols = ",\n       ".join(
        f"count(*) FILTER (b >> 4 = {i})::BIGINT AS h{i}" for i in range(n_bins)
    )
    return f"""WITH {CHARS_CTE}
SELECT doc_id,
       {cols}
FROM chars GROUP BY doc_id ORDER BY doc_id"""


def highlight_sql(terms: "list[str]", window: int = 3) -> str:
    """First-match snippet per doc; DuckDB list_slice is end-inclusive, so
    the end index is start + (2*window+1) - 1 to mirror Spark's slice."""
    no_match = 999_999_999
    pos_terms = ", ".join(
        f"CASE WHEN list_position(toks, '{t}') > 0"
        f" THEN list_position(toks, '{t}') ELSE {no_match} END"
        for t in terms
    )
    pos = f"LEAST({pos_terms})" if len(terms) > 1 else pos_terms
    width = 2 * window + 1
    return f"""WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
p AS (SELECT doc_id, toks, {pos} AS pos FROM t)
SELECT doc_id, pos::BIGINT AS match_pos,
       array_to_string(
         list_slice(toks, GREATEST(pos - {window}, 1),
                    GREATEST(pos - {window}, 1) + {width - 1}), ' ') AS snippet
FROM p WHERE pos < {no_match} ORDER BY doc_id"""


# ---------------------------------------------------- events analytics


def event_range_agg_sql(lo: str, hi: str) -> str:
    return f"""SELECT event_type,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events
WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'
GROUP BY event_type ORDER BY event_type"""


def event_hourly_rollup_sql(event_type: str) -> str:
    return f"""SELECT date_trunc('hour', ts) AS bucket,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events WHERE event_type = '{event_type}'
GROUP BY 1 ORDER BY bucket"""


def event_json_stats_sql() -> str:
    return """SELECT event_type,
       count(*)::BIGINT AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type ORDER BY event_type"""


CHARS_POS_CTE = """
cpos AS (
  SELECT doc_id, ord(ch) AS b, pos
  FROM (
    SELECT doc_id,
           unnest(string_split(text, '')) AS ch,
           generate_subscripts(string_split(text, ''), 1) AS pos
    FROM documents
  )
)"""


def video_frames_sql(every_n: int = 2, frame_bytes: int = 64) -> str:
    """Oracle for ``sample_video_frames(codec='fake')``: the blob (UTF-8
    payload of ``text``) splits into fixed-size chunks; every ``every_n``-th
    chunk emits its byte mean."""
    return f"""WITH {CHARS_POS_CTE},
frames AS (
  SELECT doc_id, ((pos - 1) // {frame_bytes})::BIGINT AS frame_idx,
         count(*)::BIGINT AS frame_len, sum(b)::BIGINT AS s
  FROM cpos GROUP BY doc_id, (pos - 1) // {frame_bytes}
)
SELECT doc_id, frame_idx, (frame_idx * {frame_bytes})::BIGINT AS byte_start,
       frame_len, CAST(s AS DOUBLE) / frame_len AS frame_mean,
       'fake' AS codec
FROM frames WHERE frame_idx % {every_n} = 0
ORDER BY doc_id, frame_idx"""


def audio_resample_sql(target_hz: int = 3, src_hz: int = 8) -> str:
    """Oracle for ``resample_audio(codec='fake')``: unsigned 8-bit PCM at
    ``src_hz``; output sample j picks input index floor(j*src/target)."""
    return f"""WITH {CHARS_POS_CTE},
lens AS (SELECT doc_id, length(text)::BIGINT AS n FROM documents),
outs AS (SELECT doc_id, n, (n * {target_hz}) // {src_hz} AS n_out FROM lens),
sel AS (
  SELECT o.doc_id, ((t.j * {src_hz}) // {target_hz}) + 1 AS pos
  FROM outs o, UNNEST(generate_series(0, o.n_out - 1)) AS t(j)
  WHERE o.n_out > 0
),
agg AS (
  SELECT s.doc_id, sum(c.b)::BIGINT AS ssum, count(*)::BIGINT AS n_out
  FROM sel s JOIN cpos c ON c.doc_id = s.doc_id AND c.pos = s.pos
  GROUP BY s.doc_id
)
SELECT o.doc_id, o.n AS n_samples_in, o.n_out AS n_samples_out,
       COALESCE(CAST(a.ssum AS DOUBLE) / CAST(o.n_out AS DOUBLE), 0.0) AS mean_out,
       'fake' AS codec
FROM outs o LEFT JOIN agg a ON a.doc_id = o.doc_id
ORDER BY o.doc_id"""


def embedding_neardup_sql(threshold: float = 0.4) -> str:
    cos = _cos("a.embedding", "b.embedding")
    return f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
ORDER BY vec_a, vec_b"""


def embedding_neardup_lsh_sql(
    threshold: float = 0.4, n_planes: int = 8, dim: int = 64
) -> str:
    """Bucketed near-dup pairs: only same-LSH-bucket pairs are compared
    (the gated scale path of ``embedding_neardup_pairs(n_planes>0)``)."""
    bucket = _bucket_sql("embedding", dim, n_planes)
    cos = _cos("a.embedding", "b.embedding")
    return f"""WITH eb AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos
FROM eb a JOIN eb b ON a.vec_id < b.vec_id AND a.bucket = b.bucket
WHERE {cos} >= {threshold}
ORDER BY vec_a, vec_b"""


def knn_filtered_topk_sql(query_vec_id: int = 0, k: int = 10,
                          label: int = 0) -> str:
    """Filtered-KNN oracle: exact cosine top-k under the metadata filter —
    the ground truth BOTH engine branches (exact-over-filter, and IVF probe
    with its can't-fill-k fallback) must reproduce when the gate pins a
    selective filter or a full/fallback probe."""
    return f"""WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}
)
SELECT vec_id, {_cos('embedding', 'qv')} AS cos
FROM embeddings CROSS JOIN q
WHERE vec_id <> {query_vec_id} AND label = {label}
ORDER BY cos DESC, vec_id ASC LIMIT {k}"""
