"""Mimic the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet, then
compare row counts, schemas, and (order-insensitively) values — floats must
be exactly equal, since both sides emulate the same float32 arithmetic.

Every gate's result is also written through to
``CORRECTNESS_local_r{NN}.json`` at the repo root (driver record format),
so ALL gates have an auditable per-round record even though the driver
samples only a subset. Partial ``-k`` runs merge into the existing file
rather than clobbering it.
"""

import json
import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_ROUND = os.environ.get("LS_ROUND", "05")
_ARTIFACT = os.path.join(
    os.path.dirname(__file__), "..", f"CORRECTNESS_local_r{_ROUND}.json"
)


def _record(name: str, rec: dict) -> None:
    try:
        with open(_ARTIFACT) as f:
            cur = json.load(f)
    except (OSError, ValueError):
        cur = {}
    cur[name] = rec
    with open(_ARTIFACT, "w") as f:
        json.dump(cur, f, indent=2)
        f.write("\n")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = []
    for row in pdf[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                assert not math.isnan(v)
                vals.append(v)
            else:
                vals.append(v)
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    rec = {
        "rows_match": False, "schema_match": False, "hash_match": False,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    try:
        q = entrymod.queries()[name]
        sql = entrymod.oracle_sql()[name]
        got = q(spark, SF_DIR).toPandas()
        want = ddb.execute(sql).df()
        rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
        rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
        rec["rows_match"] = len(got) == len(want)
        mismatches = []
        if rec["schema_match"] and rec["rows_match"]:
            g, w = _norm(got), _norm(want)
            mismatches = [(a, b) for a, b in zip(g, w) if a != b]
            rec["hash_match"] = not mismatches
    except Exception as e:  # noqa: BLE001 — recorded, then re-raised
        rec["err"] = f"{type(e).__name__}: {e}"[:500]
        _record(name, rec)
        raise
    _record(name, rec)
    assert rec["schema_match"], (
        f"{name}: schema {list(got.columns)} != {list(want.columns)}"
    )
    assert rec["rows_match"], f"{name}: rows {len(got)} != {len(want)}"
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert list(df.columns) == ["doc_id", "score"]
