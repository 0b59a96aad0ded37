"""As-of join + salted aggregation unit tests."""

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.asof import asof_join
from cassandra_data_migrator_spark.operators.skew import salted_agg
from cassandra_data_migrator_spark.sources.parquet import load_table


def test_asof_basic_semantics(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 200, "t2"), (2, 50, "t3")],
        "k BIGINT, ts BIGINT, tid STRING",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 1.0), (1, 150, 2.0), (1, 200, 3.0), (2, 60, 9.0)],
        "k BIGINT, ts BIGINT, px DOUBLE",
    )
    out = {r.tid: (r.rv_ts, r.rv_px) for r in
           asof_join(trades, quotes, ["k"], "ts", ["px"], how="inner").collect()}
    # t1@100 -> quote@90; t2@200 -> quote@200 (<= includes equality); t3@50 -> no match
    assert out == {"t1": (90, 1.0), "t2": (200, 3.0)}


def test_asof_left_keeps_unmatched(spark):
    trades = spark.createDataFrame([(2, 50, "t3")], "k BIGINT, ts BIGINT, tid STRING")
    quotes = spark.createDataFrame([(2, 60, 9.0)], "k BIGINT, ts BIGINT, px DOUBLE")
    rows = asof_join(trades, quotes, ["k"], "ts", ["px"], how="left").collect()
    assert len(rows) == 1 and rows[0].rv_ts is None


def test_asof_single_shuffle_plan(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    t = e.filter("event_id % 2 = 1").select("user_id", "event_id", "ts_us")
    q = e.filter("event_id % 2 = 0").select("user_id", "ts_us", F.col("value").alias("v"))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        asof_join(t, q, ["user_id"], "ts_us", ["v"]).explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p, "as-of must compile to union+window, not a join"


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    salted = salted_agg(
        e, ["user_id"],
        {"n": ("count", "*"), "vmax": ("max", "value"), "vmin": ("min", "value")},
        num_salts=8,
    )
    plain = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("value").alias("vmax"),
        F.min("value").alias("vmin"),
    )
    s = sorted(map(tuple, salted.collect()))
    p = sorted(map(tuple, plain.collect()))
    assert s == p


def test_salted_agg_rejects_nondecomposable(spark, sf_dir):
    import pytest

    e = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_agg(e, ["user_id"], {"d": ("count_distinct", "value")})


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    trades=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=15
    ),
    quotes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.floats(0, 10)),
        min_size=0,
        max_size=15,
        unique_by=lambda q: (q[0], q[1]),  # one quote per (key, ts): ties are undefined
    ),
)
@settings(max_examples=10, deadline=None)
def test_asof_matches_python_reference(spark_s, trades, quotes):
    spark = spark_s
    t_df = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(trades)], "k BIGINT, ts BIGINT, tid BIGINT"
    )
    q_df = spark.createDataFrame(
        [(k, ts, round(v, 3)) for k, ts, v in quotes], "k BIGINT, ts BIGINT, px DOUBLE"
    )
    got = {
        r.tid: r.rv_ts
        for r in asof_join(t_df, q_df, ["k"], "ts", ["px"], how="left").collect()
    }
    for i, (k, ts) in enumerate(trades):
        eligible = [qts for qk, qts, _ in quotes if qk == k and qts <= ts]
        expect = max(eligible) if eligible else None
        assert got[i] == expect, f"trade {i} (k={k}, ts={ts})"


import pytest as _pt


@_pt.fixture(scope="session")
def spark_s(spark):
    return spark
