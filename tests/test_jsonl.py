"""JSONL source (sources/jsonl.py): round-trip fidelity, quarantine
routing, and null-field semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources import jsonl
from cassandra_data_migrator_spark.sources.parquet import load_table

DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    """No corruption: every row round-trips byte-identically (collect-level
    compare on the small fixture) and the quarantine is empty."""
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs")
    jsonl.write_jsonl(d, path)
    good, bad = jsonl.split_quarantine(jsonl.read_jsonl(spark, path, DOC_SCHEMA))
    assert bad.count() == 0
    orig = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in d.collect()}
    back = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in good.collect()}
    assert back == orig


def test_jsonl_quarantine_routes_exactly_marked_rows(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_bad")
    marked = F.col("doc_id") % 10 == 3
    n_marked = d.filter(marked).count()
    jsonl.write_jsonl(d, path, corrupt_expr=marked)
    good, bad = jsonl.split_quarantine(jsonl.read_jsonl(spark, path, DOC_SCHEMA))
    assert bad.count() == n_marked > 0
    good_ids = {r.doc_id for r in good.select("doc_id").collect()}
    marked_ids = {r.doc_id for r in d.filter(marked).select("doc_id").collect()}
    assert good_ids.isdisjoint(marked_ids)
    assert len(good_ids) == d.count() - n_marked
    # quarantined lines carry the raw truncated text for forensics
    assert all(r.raw_line for r in bad.collect())


def test_jsonl_null_fields_survive(spark, tmp_path):
    """to_json omits null fields; the PERMISSIVE read restores them as NULL
    without tripping the corrupt path (all-null data != corrupt)."""
    df = spark.createDataFrame(
        [(1, None, "en", None, 5), (2, "hi", None, "web", None)],
        DOC_SCHEMA,
    )
    path = str(tmp_path / "nulls")
    jsonl.write_jsonl(df, path)
    good, bad = jsonl.split_quarantine(jsonl.read_jsonl(spark, path, DOC_SCHEMA))
    assert bad.count() == 0
    rows = {r.doc_id: r for r in good.collect()}
    assert rows[1].text is None and rows[1].source is None and rows[1].n_chars == 5
    assert rows[2].lang is None and rows[2].n_chars is None and rows[2].text == "hi"


def test_jsonl_schema_explicit_no_inference_scan(spark, sf_dir, tmp_path):
    """The read must not trigger JSON schema inference (an extra full scan):
    reading with an explicit schema yields exactly that schema, including
    for an empty directory glob of matching files."""
    d = load_table(spark, sf_dir, "documents").limit(5)
    path = str(tmp_path / "docs_s")
    jsonl.write_jsonl(d, path)
    parsed = jsonl.read_jsonl(spark, path, DOC_SCHEMA)
    assert [f.name for f in parsed.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars", jsonl.CORRUPT_COL,
    ]


def test_jsonl_hostile_strings_roundtrip(spark, tmp_path):
    """Embedded newlines, quotes, backslashes, tabs, and non-BMP unicode
    must survive the line-based serialization byte-for-byte: to_json
    escapes them, so every row stays one line and reparses exactly."""
    rows = [
        (1, 'line1\nline2\r\nline3'),
        (2, 'quote " and \\ backslash'),
        (3, 'tab\there and emoji 🦆 and é'),
        (4, '{"looks":"like json"}'),
        (5, ''),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    path = str(tmp_path / "hostile")
    jsonl.write_jsonl(df, path)
    # every record is exactly one physical line
    assert spark.read.text(path).count() == len(rows)
    good, bad = jsonl.split_quarantine(
        jsonl.read_jsonl(spark, path, "doc_id BIGINT, text STRING")
    )
    assert bad.count() == 0
    back = {r.doc_id: r.text for r in good.collect()}
    assert back == dict(rows)


def test_jsonl_minimal_record_corruption_still_quarantined(spark, tmp_path):
    """Round-5 review: an all-null row serializes to '{}'; its truncated
    line must stay non-empty and be QUARANTINED, not skipped or leaked to
    the good path as a phantom all-null row."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(None, None), (2, "ok")], "doc_id BIGINT, text STRING"
    )
    path = str(tmp_path / "minimal")
    jsonl.write_jsonl(df, path, corrupt_expr=F.col("doc_id").isNull())
    good, bad = jsonl.split_quarantine(
        jsonl.read_jsonl(spark, path, "doc_id BIGINT, text STRING")
    )
    assert bad.count() == 1, "the corrupted minimal record must be quarantined"
    assert bad.collect()[0].raw_line == "{"
    assert [(r.doc_id, r.text) for r in good.collect()] == [(2, "ok")]


def test_jsonl_blank_lines_skipped(spark, tmp_path):
    """Blank lines in hand-edited/concatenated JSONL are skipped (matching
    spark.read.json), never surfaced as all-null rows."""
    p = tmp_path / "blank"
    p.mkdir()
    (p / "part-0.txt").write_text('{"doc_id":1,"text":"a"}\n\n   \n{"doc_id":2,"text":"b"}\n')
    good, bad = jsonl.split_quarantine(
        jsonl.read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    )
    assert bad.count() == 0
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [(1, "a"), (2, "b")]
