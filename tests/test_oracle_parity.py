"""Differential test: every declared query vs its DuckDB oracle (SURVEY.md
§5.2.1). Mirrors the driver's check: row count + (normalized) schema + order-
insensitive value comparison at sf0.001 (the driver runs sf0.01; run
``SPARK_GRAFT_SF_SMALL=/root/testdata/sf0.01 pytest`` for the full-size run).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from cassandra_data_migrator_spark.sources.parquet import TABLES

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# keys intentionally without an oracle (engine-specific hash families)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 4)
                if math.isnan(v):
                    v = "nan"
                elif v == 0.0 and math.copysign(1.0, v) < 0.0:
                    # keep the driver's signed-zero sensitivity: -0.0 must
                    # NOT compare equal to 0.0 (Python float == would)
                    v = "-0.0"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_query_matches_oracle(key, spark, sf_dir, ddb):
    sdf = QUERIES[key](spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cols = sorted(sdf.columns)

    odf = ddb.execute(ORACLES[key]).fetch_arrow_table()
    assert sorted(odf.column_names) == cols, (
        f"{key}: column mismatch spark={cols} duck={sorted(odf.column_names)}"
    )
    duck_rows = odf.to_pylist()

    assert len(spark_rows) == len(duck_rows), (
        f"{key}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, cols)
    d_norm = _normalize(duck_rows, cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ][:5]
    assert not mismatches, f"{key}: value mismatches (first 5): {mismatches}"


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_keys_run(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns
