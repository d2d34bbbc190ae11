"""Mimic the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet, then
compare row counts, schemas, and (order-insensitively) values — floats must
be exactly equal, since both sides emulate the same float32 arithmetic.
"""

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
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = q(spark, SF_DIR).toPandas()
    want = ddb.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: schema {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _norm(got), _norm(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert list(df.columns) == ["doc_id", "score"]
