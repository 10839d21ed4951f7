"""Local stand-in for the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle on the same parquet, compare
row count, column names, and an order-insensitive value representation.

Floats are compared to 9 significant digits: per-row double arithmetic is
IEEE-identical across engines and multi-row sums go through exact decimal
accumulation (plans/tables.dsum), so anything looser than ~1e-9 relative
indicates a real bug, not float noise.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from liq_stream_spark.compare import frame_repr
from liq_stream_spark.schema import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_names, s_body = frame_repr(spark_cols, spark_rows)
    d_names, d_body = frame_repr(duck_cols, duck_rows)

    assert s_names == d_names, f"{name}: column names differ"
    assert len(s_body) == len(d_body), (
        f"{name}: row count {len(s_body)} vs oracle {len(d_body)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_body, d_body) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_rows_only_queries_run(spark):
    oracled = set(entrymod.oracle_sql())
    for name, q in entrymod.queries().items():
        if name not in oracled:
            assert q(spark, SF_DIR).count() >= 0, name
