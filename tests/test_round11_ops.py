"""Round-11 regression tests (ADVICE r10 follow-ups + new surface)."""

import re
from pathlib import Path

import pytest


def test_coverage_totals_match_registry():
    """COVERAGE.md's judge-checkable totals line must equal the live
    registry (verdict r10 #6 — the inventory count lagged the registry
    in r10)."""
    from cassandra_data_migrator_spark.queries.oracles import oracle_sql
    from cassandra_data_migrator_spark.queries.registry import (
        ROWS_ONLY_KEYS,
        queries,
    )

    text = (Path(__file__).parent.parent / "COVERAGE.md").read_text()
    m = re.search(
        r"Totals: \*\*(\d+) declared query keys\*\* \((\d+) with DuckDB "
        r"oracles, (\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md totals line missing or reformatted"
    declared, oracled, rows_only = map(int, m.groups())
    qs, os_ = queries(), oracle_sql()
    assert declared == len(qs)
    assert oracled == len(os_) == len(set(qs) & set(os_))
    assert rows_only == len(ROWS_ONLY_KEYS) == len(qs) - len(os_)
    assert set(qs) - set(os_) == set(ROWS_ONLY_KEYS)


def test_migrate_custom_ttl_writetime_without_tracked_cells(
    spark, sf_dir, monkeypatch
):
    """A constant custom TTL / writetime is honored even when the input has
    NO tracked __ttl_* / __writetime_* cells (ADVICE r10: the constant is a
    fixed override in CDM and needs no per-cell tracking; previously the
    guard `if ttl_cols:` silently dropped it)."""
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.plans.migrate import run_migrate
    from cassandra_data_migrator_spark.sources import cassandra as cass
    from cassandra_data_migrator_spark.sources.parquet import load_table

    captured = {}

    def fake_write_table(df, ks, tbl, options=None, **kw):
        captured.update(df=df, options=dict(options or {}))
        df.write.format("noop").mode("overwrite").save()

    monkeypatch.setattr(cass, "write_table", fake_write_table)
    events = load_table(spark, sf_dir, "events")  # no attach_* → no tracked cells
    cfg = MigrationConfig(
        {
            "spark.cdm.connect.target.format": "cassandra",
            "spark.cdm.schema.target.table": "ks.t",
            "spark.cdm.transform.custom.ttl": 86400,
            "spark.cdm.transform.custom.writetime": 1723766400000000,
        }
    )
    run_migrate(spark, events, cfg)
    assert captured["options"]["ttl"] == "__ttl"
    assert captured["options"]["writetime"] == "__writetime"
    row = captured["df"].select("__ttl", "__writetime").distinct().collect()
    assert [(r["__ttl"], r["__writetime"]) for r in row] == [
        (86400, 1723766400000000)
    ]


def test_prefix_filter_cache_survives_stale_slot(spark, sf_dir):
    """Evicting a cached ordered-sets slot left over from a STOPPED
    SparkSession must not raise (ADVICE r10): the new-session key never
    matches (applicationId differs), so the first invocation evicts the
    dead slot — the unpersist must be best-effort."""
    from cassandra_data_migrator_spark.operators import dedup
    from cassandra_data_migrator_spark.sources.parquet import load_table

    class DeadDF:
        def unpersist(self, blocking=False):
            raise RuntimeError("py4j: SparkContext stopped")

    saved = dict(dedup._PREFIX_FILTER_CACHE)
    try:
        dedup._PREFIX_FILTER_CACHE.clear()
        dedup._PREFIX_FILTER_CACHE.update(key=("dead-app",), docs=DeadDF())
        docs = load_table(spark, sf_dir, "documents").limit(50)
        out = dedup.prefix_filter_jaccard_pairs(docs, threshold=0.8)
        assert out.count() >= 0  # must not raise through the eviction
        assert not isinstance(dedup._PREFIX_FILTER_CACHE.get("docs"), DeadDF)
    finally:
        cur = dedup._PREFIX_FILTER_CACHE.get("docs")
        if cur is not None and not isinstance(cur, DeadDF):
            try:
                cur.unpersist(blocking=False)
            except Exception:
                pass
        dedup._PREFIX_FILTER_CACHE.clear()
        dedup._PREFIX_FILTER_CACHE.update(saved)
