"""Property-based tests (hypothesis) for the engine's pure deterministic
kernels — the SURVEY §5 strategy gap: example-based tests pin known cases,
these pin ALGEBRAIC guarantees over generated inputs.

Spark-touching properties batch all generated examples into ONE DataFrame per
test run (a per-example SparkSession round-trip would be minutes, not
seconds)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_data_migrator_spark.config import (
    ENV_PREFIX,
    KNOWN_KEYS,
    MigrationConfig,
    env_var_to_key,
)
from cassandra_data_migrator_spark.functions.tokens import (
    TOKEN_MAX,
    TOKEN_MIN,
    TOKEN_MODULUS,
    TOKEN_MULTIPLIER,
)


# ---------------------------------------------------------------------------
# token ring (pure integer math — mirror of functions/tokens.py expressions)


def _tok_py(k: int) -> int:
    return (k * TOKEN_MULTIPLIER) % TOKEN_MODULUS + TOKEN_MIN


@given(st.integers(min_value=0, max_value=10_000_000))
def test_token_stays_on_ring(k):
    t = _tok_py(k)
    assert TOKEN_MIN <= t <= TOKEN_MAX


@given(st.integers(min_value=0, max_value=10_000_000), st.sampled_from([2, 4, 8, 16, 32, 64]))
def test_slice_id_in_range_and_total(k, n):
    from cassandra_data_migrator_spark.functions.tokens import slice_width

    sid = (_tok_py(k) - TOKEN_MIN) // slice_width(n)
    assert 0 <= sid < n


# ---------------------------------------------------------------------------
# config env-var round trip


@given(
    st.sampled_from(sorted(KNOWN_KEYS)),
)
def test_env_var_name_round_trips_to_key(key):
    env_name = ENV_PREFIX + key.upper().replace(".", "_")
    assert env_var_to_key(env_name) == key.lower()
    # and the case-insensitive registry accepts it
    typ, default = KNOWN_KEYS[key]
    value = {bool: "true", int: "7", str: "x"}[typ]
    cfg = MigrationConfig({env_var_to_key(env_name): value})
    assert key in cfg.values


# ---------------------------------------------------------------------------
# CQL duration codec round trip (one Spark batch for all examples)

_dur_components = st.tuples(
    st.integers(min_value=0, max_value=11),  # months (within a year)
    st.integers(min_value=0, max_value=30),  # days
    st.integers(min_value=0, max_value=23),  # h
    st.integers(min_value=0, max_value=59),  # m
    st.integers(min_value=0, max_value=59),  # s
    st.integers(min_value=0, max_value=999),  # ms
)


@settings(max_examples=1, deadline=None)
@given(st.lists(_dur_components, min_size=30, max_size=30, unique=True))
def test_duration_format_parse_roundtrip(spark, batch):
    """parse(format(parse(s))) == parse(s): the canonical text emitted by
    cql_duration_format re-parses to the identical wire triple for every
    generated component combination."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions import codecs

    rows = []
    for mo, d, h, m, s, ms in batch:
        text = "".join(
            f"{v}{u}"
            for v, u in ((mo, "mo"), (d, "d"), (h, "h"), (m, "m"), (s, "s"), (ms, "ms"))
            if v > 0
        )
        rows.append((text,))
    df = spark.createDataFrame(rows, "dur STRING")
    out = (
        df.withColumn("p1", codecs.cql_duration_parse(F.col("dur")))
        .withColumn("canon", codecs.cql_duration_format(F.col("p1")))
        .withColumn("p2", codecs.cql_duration_parse(F.col("canon")))
        .select("dur", "p1", "p2")
        .collect()
    )
    for r in out:
        assert r.p1 == r.p2, f"roundtrip mismatch for {r.dur!r}: {r.p1} != {r.p2}"


# ---------------------------------------------------------------------------
# cell-wise upsert algebra (one Spark batch for all examples)


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=19),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        ),
        min_size=5,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
def test_upsert_cellwise_unset_never_nulls_existing(spark, updates):
    """Under the 'unset' policy, a non-null base cell can never become null —
    for ANY generated update batch (null and non-null update cells mixed)."""
    from cassandra_data_migrator_spark.sources.sink import upsert_cellwise

    base = spark.createDataFrame([(i, i * 10) for i in range(20)], "id INT, v INT")
    upd = spark.createDataFrame(updates, "id INT, v INT")
    merged = {r.id: r.v for r in upsert_cellwise(base, upd, ["id"], ["v"], "unset").collect()}
    upd_map = dict(updates)
    assert len(merged) == 20
    for i in range(20):
        if i in upd_map and upd_map[i] is not None:
            assert merged[i] == upd_map[i]
        else:
            assert merged[i] == i * 10  # unset or absent → base survives
