"""Driver-contract integration: every ``queries()`` entry runs at
sf0.01 and, when an ``oracle_sql()`` entry exists, must match DuckDB
on row count, column names, and (order-insensitive) values — the same
comparison the external driver performs."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(df_rows, cols):
    out = []
    for r in df_rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(_norm(d[c]) for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_against_oracle(spark, ducks, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = sdf.collect()
    cols = sdf.columns
    # non-vacuity: an oracle that compares zero rows gates nothing
    # (round-3 `embedding_pairs` was "green" with both engines empty)
    assert len(spark_rows) > 0, f"{name}: vacuous query (0 rows at sf0.01)"
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        return  # rows-only check (driver's weak gate)
    res = ducks.sql(oracle)
    duck_cols = res.columns
    duck_rows = res.fetchall()
    assert sorted(cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    a = _rows([tuple(r[c] for c in cols) for r in spark_rows], cols)
    b = _rows(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["id", "rank"]
