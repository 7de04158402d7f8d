"""Replicates the driver's DuckDB-oracle comparison for every oracle query.

For each (queries()[name], oracle_sql()[name]) pair at sf0.01: row count,
column names, and order-insensitive value multiset must match (floats rounded
to absorb engine-order summation noise).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not available")


def _norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return round(float(v), 4)
    return v


def _norm_rows(rows):
    return sorted(tuple(_norm_val(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ducks, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [[row[c] for c in sdf.columns] for row in sdf.collect()]

    rel = ducks.sql(ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)} rows"
    a, b = _norm_rows(spark_rows), _norm_rows(duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without oracle must still execute and return a stable schema."""
    if name.startswith("extract_"):
        sf = "/root/testdata/sf0.001"  # keep the HTML-parse queries quick
    else:
        sf = SF_DIR
    df = QUERIES[name](spark, sf)
    assert df.columns
    assert df.count() >= 0
