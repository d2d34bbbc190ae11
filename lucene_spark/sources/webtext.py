"""Deterministic synthetic Common-Crawl-style `pages` corpus (FIXTURES.md §1).

Schema matches BASELINE.json input_hint:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is seeded and *per-row deterministic* (a row's content depends
only on its index i and the seed), so any scale/partitioning produces the
same logical table — the bench's local[8] vs local[32] runs see identical
bytes, and the html→text extraction invariant is checkable per row.

Analog of the reference benchmark's content sources
(lucene/benchmark/.../feeds/EnwikiContentSource.java etc.), replaced by a
Zipfian generator: 10k-term vocab t0000..t9999 with Zipf(s=1.1) weights, 30%
stopword tokens, LogNormal(5, 1) doc lengths clipped to [1, 2000].
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.analysis import ENGLISH_STOP_WORDS

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
_STOPS = np.array(sorted(ENGLISH_STOP_WORDS), dtype=object)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _vocab() -> np.ndarray:
    return np.array([f"t{i:04d}" for i in range(VOCAB_SIZE)], dtype=object)


def _zipf_probs() -> np.ndarray:
    w = 1.0 / np.arange(1, VOCAB_SIZE + 1, dtype=np.float64) ** ZIPF_S
    return w / w.sum()


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based deterministic hashing."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _u01(x: np.ndarray) -> np.ndarray:
    return _mix64(x).astype(np.float64) / 18446744073709551616.0


def generate_pages_pdf(
    start: int, end: int, seed: int = 42, rich: bool = False
) -> pd.DataFrame:
    """Rows i in [start, end) — deterministic per (i, seed), vectorized.

    Randomness is counter-based (splitmix64 of (seed, i, stream, j)), so a
    row's content is identical regardless of chunking/partitioning.

    ``rich=True`` emits REAL markup (doctype, head with title/script/style,
    paragraph structure, inline tags, character entities) and defines the
    ``text`` column as ``html_strip(html)`` — the extraction invariant then
    exercises the full HTMLStripCharFilter port (``functions/html.py``)
    instead of the trivial wrapper strip. All markup choices derive from the
    same counter-based hash, so rich pages are chunking-independent too.
    """
    vocab = _vocab()
    cum = np.cumsum(_zipf_probs())
    rows_i = np.arange(start, end, dtype=np.uint64)
    skey = np.uint64(seed) * np.uint64(0x100000001B3)

    # doc length ~ LogNormal(5,1) clipped to [1,2000]; z via Irwin-Hall(12)
    z = np.zeros(len(rows_i), dtype=np.float64)
    for s in range(12):
        z += _u01(rows_i * np.uint64(12) + np.uint64(s) + skey)
    z -= 6.0
    lengths = np.clip(np.exp(5.0 + z), 1, 2000).astype(np.int64)

    total = int(lengths.sum())
    doc_of_tok = np.repeat(np.arange(len(rows_i), dtype=np.int64), lengths)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    j = np.arange(total, dtype=np.uint64) - starts[doc_of_tok].astype(np.uint64)
    ctr = rows_i[doc_of_tok] * np.uint64(0x51_7CC1B7_2722_0A95) + j
    is_stop = _u01(ctr + skey + np.uint64(1)) < 0.30
    r2 = _u01(ctr + skey + np.uint64(2))
    toks = np.empty(total, dtype=object)
    toks[is_stop] = _STOPS[(r2[is_stop] * len(_STOPS)).astype(np.int64)]
    toks[~is_stop] = vocab[np.searchsorted(cum, r2[~is_stop])]

    bounds = np.cumsum(lengths)[:-1]
    texts = [" ".join(chunk.tolist()) for chunk in np.split(toks, bounds)]
    ii = rows_i.astype(np.int64)
    for pos in np.nonzero(ii % 97 == 0)[0]:  # ~1% edge docs
        texts[pos] = texts[pos] + " übergrenzwertig中文 " + ("x" * 300)

    urls = [f"https://site{int(i) % 1000}.example/page/{int(i)}" for i in ii]
    langs = ["en" if r < 95 else ("de" if r < 98 else "zh") for r in ii % 100]
    if rich:
        html_s = [
            _rich_html(int(i), lang, chunk)
            for i, lang, chunk in zip(ii, langs, np.split(toks, bounds))
        ]
        # ~1% edge docs keep their CJK/overlong tail, as plain body text
        for pos in np.nonzero(ii % 97 == 0)[0]:
            html_s[pos] = html_s[pos].replace(
                "</body>", "übergrenzwertig中文 " + ("x" * 300) + "</body>"
            )
        from ..functions.html import html_strip_batch

        texts = html_strip_batch(html_s).to_pylist()
        html = [h.encode("utf-8") for h in html_s]
    else:
        html = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]
    ts = [_EPOCH + dt.timedelta(seconds=int(i)) for i in ii]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": html, "text": texts, "lang": langs}
    )


_INLINE_WRAPS = ["b", "em", "strong", "span", "code"]
_ENTITY_SEPS = [" &amp; ", " &ndash; ", " &middot; ", " &#8212; "]


def _rich_html(i: int, lang: str, toks: np.ndarray) -> str:
    """One deterministic Common-Crawl-ish page around the token stream."""
    h = int(_mix64(np.array([np.uint64(i) + np.uint64(0xA5A5)], dtype=np.uint64))[0])
    para_len = 8 + (h % 13)
    parts = [
        f'<!DOCTYPE html><html lang="{lang}"><head>'
        f"<title>page {i}</title>"
        f'<script type="text/javascript">var p = {i}; if (p > 0) {{ track("<p>"); }}</script>'
        "<style>body { margin: 0; }</style>"
        "<!-- generator: webtext -->"
        f"</head><body><h1>page {i}</h1>"
    ]
    words = toks.tolist()
    for p0 in range(0, len(words), para_len):
        para = words[p0 : p0 + para_len]
        hh = h ^ (p0 * 0x9E3779B9)
        if para and (hh % 3) == 0:  # wrap one word in an inline element
            w = (hh >> 4) % len(para)
            tag = _INLINE_WRAPS[(hh >> 8) % len(_INLINE_WRAPS)]
            para[w] = f"<{tag}>{para[w]}</{tag}>"
        sep = " "
        body = sep.join(para)
        if (hh % 5) == 0:  # entity separator somewhere in the paragraph
            cut = body.find(" ", len(body) // 2)
            if cut > 0:
                body = body[:cut] + _ENTITY_SEPS[(hh >> 12) % len(_ENTITY_SEPS)] + body[cut + 1 :]
        parts.append(f"<p>{body}</p>")
    parts.append(f'<p><a href="/page/{i + 1}">next</a> <br/> page {i}</p>')
    parts.append("</body></html>")
    return "".join(parts)


def extract_text(html: bytes) -> str:
    """html -> text extractor; must reproduce the `text` column byte-identically
    (BASELINE.json per-row invariant).

    Trivial-wrapper pages (the default corpus) take the exact-substring fast
    path; anything else — the ``rich=True`` corpus, real crawled pages — runs
    the full HTMLStripCharFilter port (``functions/html.py``).
    """
    body = html
    if body.startswith(b"<html><body>") and body.endswith(b"</body></html>"):
        return body[len(b"<html><body>") : -len(b"</body></html>")].decode("utf-8")
    from ..functions.html import html_strip

    return html_strip(html.decode("utf-8"))


def pages_df(
    spark: SparkSession, n_docs: int, seed: int = 42, n_partitions: int = 8,
    rich: bool = False,
) -> DataFrame:
    """Distributed deterministic generation: each task generates its row range."""
    bounds = np.linspace(0, n_docs, n_partitions + 1).astype(np.int64)
    ranges = [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_partitions)]
    rdf = spark.createDataFrame(ranges, schema="start long, end long").repartition(n_partitions, "start")

    def gen(batches):
        for pdf in batches:
            for s, e in zip(pdf["start"], pdf["end"]):
                if e > s:
                    yield generate_pages_pdf(int(s), int(e), seed, rich=rich)

    return rdf.mapInPandas(gen, schema=PAGES_SCHEMA)
