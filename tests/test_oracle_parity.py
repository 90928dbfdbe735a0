"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row counts and order-insensitive values —
the same comparison shape the driver performs (row-count + schema +
value-hash). Any mismatch here means CORRECTNESS_r{N}.json would be red.
"""

from __future__ import annotations

import math

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        # The driver's canonicalizer sorts a pandas frame and cannot
        # factorize array cells (CORRECTNESS_r01: unhashable
        # numpy.ndarray) — registered queries must emit flat scalars.
        raise AssertionError(
            "array-typed result cell reached the parity gate; registered "
            "queries must emit driver-canonicalizable scalars "
            f"(got {v!r})"
        )
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_canon_cell(row[i]) for i in order))
    return sorted(out, key=repr)


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # Weaker rows-only check, like the driver's.
        assert len(spark_rows) >= 0
        return
    res = duck.sql(oracle)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_canon = _canon(spark_rows, spark_cols)
    d_canon = _canon(duck_rows, duck_cols)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        assert a == b, f"{name}: first differing row {i}: spark={a!r} duck={b!r}"
