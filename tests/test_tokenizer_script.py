"""Script-aware tokenization (r09 verdict #3): cross-engine token-LEVEL
agreement between Spark's Java-regex path and DuckDB's RE2 twin, plus the
collapse-made-visible property the tokenizer_cjk_fertility key relies on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.text import (
    CJK_SINGLE_RE_JAVA,
    CJK_SINGLE_RE_RE2,
    SCRIPT_TOKEN_RE_JAVA,
    SCRIPT_TOKEN_RE_RE2,
    tokens,
    tokens_script,
)

SAMPLES = [
    "hello world 你好世界模型",
    "AI人工智能こんにちはmodel x",
    "สวัสดีโลก test",
    "plain ascii text!",
    "カタカナkatakana混じり",
    "",
    "   ",
]


def test_script_tokens_cross_engine_agreement(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = [
        r.t
        for r in df.select(
            tokens_script("s").alias("t")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT regexp_extract_all(lower(?), ?, 1)",
            [s, SCRIPT_TOKEN_RE_RE2],
        ).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_cjk_single_classification_cross_engine(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = [
        r.n
        for r in df.select(
            F.size(
                F.filter(tokens_script("s"), lambda t: t.rlike(CJK_SINGLE_RE_JAVA))
            ).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT len(list_filter(regexp_extract_all(lower(?), ?, 1),"
            " t -> regexp_matches(t, ?)))",
            [s, SCRIPT_TOKEN_RE_RE2, CJK_SINGLE_RE_RE2],
        ).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_whitespace_collapse_made_visible(spark):
    """The exact failure the script path fixes: a Han run is ONE whitespace
    token but one token PER CHARACTER script-aware."""
    df = spark.createDataFrame([("你好世界模型",)], "s string")
    row = df.select(
        F.size(tokens("s")).alias("ws"),
        F.size(tokens_script("s")).alias("sc"),
    ).collect()[0]
    assert row.ws == 1 and row.sc == 6


def test_script_tokens_stay_jvm_side(spark):
    """No Python in the plan — the script path is regexp_extract_all."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.select(tokens_script("s").alias("t")).explain("simple")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
