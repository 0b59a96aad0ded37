"""Unit + property tests for pure functions: codecs, tokens, partition-file
I/O (SURVEY.md §5.2.3; hypothesis for the closed-form invariants)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions import codecs
from cassandra_data_migrator_spark.functions.tokens import (
    TOKEN_MAX,
    TOKEN_MIN,
    TOKEN_MODULUS,
    TOKEN_MULTIPLIER,
    slice_bounds,
    slice_width,
)
from cassandra_data_migrator_spark.operators.partition import (
    append_failed_ranges,
    read_partition_file,
    restrict_to_token_ranges,
)


def _py_tok(k: int) -> int:
    # Python's % is floored like Spark/DuckDB for positive divisor+dividend
    return (k * TOKEN_MULTIPLIER) % TOKEN_MODULUS + TOKEN_MIN


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=200, deadline=None)
def test_token_stays_on_ring(k):
    assert TOKEN_MIN <= _py_tok(k) <= TOKEN_MAX


@given(st.integers(min_value=1, max_value=20).map(lambda p: 2**p))
@settings(max_examples=20, deadline=None)
def test_slice_bounds_partition_ring(n):
    bounds = slice_bounds(n)
    assert len(bounds) == n
    assert bounds[0][1] == TOKEN_MIN and bounds[-1][2] == TOKEN_MAX
    assert all(hi - lo + 1 == slice_width(n) for _, lo, hi in bounds)


def test_codec_blob_roundtrip(spark):
    df = spark.createDataFrame([("hello",)], "s STRING")
    row = df.select(
        codecs.blob_to_hex(codecs.string_to_blob(F.col("s"))).alias("hx"),
        codecs.blob_to_base64(codecs.string_to_blob(F.col("s"))).alias("b64"),
    ).first()
    assert row.hx == "68656c6c6f"
    assert row.b64 == "aGVsbG8="


def test_codec_timestamp_string_roundtrip(spark):
    df = spark.createDataFrame([("2024-03-01 12:30:45",)], "s STRING")
    row = df.select(
        codecs.timestamp_to_string(codecs.string_to_timestamp(F.col("s"))).alias("rt")
    ).first()
    assert row.rt == "2024-03-01 12:30:45"


def test_codec_numeric_string(spark):
    df = spark.createDataFrame([(17.5, 42)], "d DOUBLE, i LONG")
    row = df.select(
        codecs.double_to_string(F.col("d")).alias("ds"),
        codecs.int_to_string(F.col("i")).alias("is_"),
        codecs.string_to_bigint(F.lit("123")).alias("bi"),
    ).first()
    assert (row.ds, row.is_, row.bi) == ("17.50", "42", 123)


def test_timeuuid_exact_at_field_boundaries(spark):
    """The 60-bit timestamp field split must be exact integer division: the
    gregorian-offset timestamp t ≈ 1.4e17 exceeds 2^53, so a naive double
    `/` rounds the quotient wrong when t sits within a few ULPs of a
    multiple of 2^32 / 2^48 (round-3 advice). Pin t values straddling those
    boundaries against Python's exact `//`."""
    from cassandra_data_migrator_spark.functions.codecs import (
        GREGORIAN_OFFSET_100NS,
        timeuuid_from_parts,
    )

    cases = []
    for mult, ks in ((2**32, (32000000, 32500000)), (2**48, (494, 495))):
        for k in ks:
            for d in range(-10, 11):
                ts_us, rem = divmod(k * mult + d - GREGORIAN_OFFSET_100NS, 10)
                if rem == 0 and ts_us > 0:
                    cases.append(ts_us)
    assert cases, "boundary case generator produced nothing"
    df = spark.createDataFrame(
        [(c, i % 16384, (i * 2654435761) % 2**48) for i, c in enumerate(cases)],
        "ts_us long, cs long, nd long",
    )
    out = df.select(
        "ts_us", "cs", "nd",
        timeuuid_from_parts(F.col("ts_us"), F.col("cs"), F.col("nd")).alias("u"),
    ).collect()
    for r in out:
        t = r.ts_us * 10 + GREGORIAN_OFFSET_100NS
        exp = "-".join([
            f"{t % 2**32:08x}",
            f"{(t // 2**32) % 2**16:04x}",
            f"{(t // 2**48) % 2**12 + 0x1000:04x}",
            f"{r.cs % 16384 + 0x8000:04x}",
            f"{r.nd % 2**48:012x}",
        ])
        assert r.u == exp, f"ts_us={r.ts_us}: {r.u} != {exp}"


def test_timestamp_to_millis_truncates(spark):
    df = spark.createDataFrame([(1704067798778549,)], "us LONG")
    assert df.select(codecs.timestamp_to_millis(F.col("us")).alias("ms")).first().ms == 1704067798778


def test_partition_file_roundtrip(tmp_path):
    p = str(tmp_path / "parts.csv")
    with open(p, "w") as fh:
        fh.write("# retry list\n-100,50\n")
    append_failed_ranges(p, [(60, 70)])
    assert read_partition_file(p) == [(-100, 50), (60, 70)]


def test_partition_file_rejects_inverted_range(tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as fh:
        fh.write("10,5\n")
    try:
        read_partition_file(p)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_restrict_to_token_ranges(spark, sf_dir):
    from cassandra_data_migrator_spark.functions.tokens import tok
    from cassandra_data_migrator_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    full = o.count()
    sub = restrict_to_token_ranges(o, "o_orderkey", [(TOKEN_MIN, 0)])
    n = sub.count()
    assert 0 < n < full
    # complement covers the rest exactly
    rest = restrict_to_token_ranges(o, "o_orderkey", [(1, TOKEN_MAX)])
    assert n + rest.count() == full
    # empty range list -> empty scan scope
    assert restrict_to_token_ranges(o, "o_orderkey", []).count() == 0

def test_array_length_guardrail(spark, sf_dir):
    from cassandra_data_migrator_spark.operators.guardrail import array_length_guardrail
    from cassandra_data_migrator_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # fixture vectors are all 64-dim -> none flagged at 64, all flagged at 63
    assert array_length_guardrail(emb, ["vec_id"], "embedding", 64).count() == 0
    assert array_length_guardrail(emb, ["vec_id"], "embedding", 63).count() == emb.count()


def test_simhash_banding_guard():
    import pytest as _pytest

    from cassandra_data_migrator_spark.operators.dedup import simhash_near_dup_pairs

    with _pytest.raises(ValueError):
        simhash_near_dup_pairs(None, max_hamming=9, num_chunks=9)


def test_cql_duration_parse_rejects_malformed(spark):
    """Round-4 advice: malformed input must raise regardless of the
    session's spark.sql.mapKeyDedupPolicy — a repeated unit ('5h3h') and
    unconsumed residue ('5hx', '1h 2m', 'h5') are all rejected explicitly,
    never silently first/last-win or dropped."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions.codecs import cql_duration_parse

    for bad in ["5h3h", "5hx", "1h 2m", "h5", "x"]:
        df = spark.createDataFrame([(bad,)], "d STRING")
        with _pytest.raises(Exception):
            df.select(cql_duration_parse(F.col("d")).alias("p")).collect()


def test_cql_duration_parse_rejects_duplicates_under_last_win(spark):
    """The duplicate-unit reject must hold even when str_to_map is
    configured to silently keep the last occurrence."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions.codecs import cql_duration_parse

    old = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try:
        df = spark.createDataFrame([("5h3h",)], "d STRING")
        with _pytest.raises(Exception, match="malformed CQL duration"):
            df.select(cql_duration_parse(F.col("d")).alias("p")).collect()
        ok = spark.createDataFrame([("12h30m",)], "d STRING")
        row = ok.select(cql_duration_parse(F.col("d")).alias("p")).first()
        assert (row.p.months, row.p.days, row.p.nanos) == (0, 0, 45_000_000_000_000)
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", old)


def test_cql_duration_parse_and_format(spark):
    """CQL duration type (SURVEY.md §1.2): string → (months, days, nanos)
    triple and back. No DuckDB oracle exists for duration, so this is the
    pytest-level coverage the survey designates."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions.codecs import (
        cql_duration_format,
        cql_duration_parse,
    )

    df = spark.createDataFrame(
        [
            ("1y2mo3w4d5h6m7s8ms9us10ns",),
            ("12h30m",),
            ("2mo",),
            ("90s",),
            ("",),
        ],
        "d STRING",
    )
    rows = df.select(cql_duration_parse(F.col("d")).alias("p")).collect()
    got = [(r.p.months, r.p.days, r.p.nanos) for r in rows]
    assert got == [
        (14, 25, 5 * 3600_000_000_000 + 6 * 60_000_000_000 + 7_000_000_000 + 8_000_000 + 9_000 + 10),
        (0, 0, 12 * 3600_000_000_000 + 30 * 60_000_000_000),
        (2, 0, 0),
        (0, 0, 90_000_000_000),
        (0, 0, 0),
    ]
    # canonical format is reversible
    fmt = df.select(
        cql_duration_parse(cql_duration_format(cql_duration_parse(F.col("d")))).alias("p2"),
        cql_duration_parse(F.col("d")).alias("p1"),
    ).collect()
    for r in fmt:
        assert (r.p1.months, r.p1.days, r.p1.nanos) == (r.p2.months, r.p2.days, r.p2.nanos)


def test_timestamp_add_duration(spark):
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions.codecs import (
        cql_duration_parse,
        timestamp_add_duration,
    )

    df = spark.createDataFrame([("2024-01-31 10:00:00", "1mo2d3h")], "ts STRING, d STRING")
    out = df.select(
        F.date_format(
            timestamp_add_duration(
                F.to_timestamp("ts"), cql_duration_parse(F.col("d"))
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("shifted")
    ).first()
    # +1 month clamps Jan 31 -> Feb 29 (2024 leap), then +2d -> Mar 2, +3h
    assert out.shifted == "2024-03-02 13:00:00"


def test_duration_rejects_tokenizer_shaped_input(spark):
    """Round-5 review: strings that MIMIC the tokenizer's intermediate form
    ('y:1,' / 'h:5,' / '1hmo:3,') must raise, not parse — the whole-string
    shape check anchors on the ORIGINAL column."""
    import pytest
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions import codecs

    for bad in ["y:1,", "h:5,", "1hmo:3,", "mo:2", "1h,", ":", "5h 3m"]:
        df = spark.createDataFrame([(bad,)], "s STRING")
        with pytest.raises(Exception, match="malformed CQL duration"):
            df.select(codecs.cql_duration_parse(F.col("s")).alias("d")).collect()
    # and the adjacent valid forms still parse
    ok = spark.createDataFrame([("1y2mo3d",), ("5h3m",), ("",)], "s STRING")
    rows = ok.select(codecs.cql_duration_parse(F.col("s")).alias("d")).collect()
    assert rows[0].d.months == 14 and rows[0].d.days == 3
    assert rows[1].d.nanos == 5 * 3_600_000_000_000 + 3 * 60_000_000_000


def test_duration_guard_fires_on_every_struct_child(spark):
    """Round-6 advice: Catalyst's SimplifyExtractValueOps rewrites
    GetStructField(CreateNamedStruct(...)) to just the extracted child, so
    a guard attached only to `months` would be pruned away for a consumer
    that reads `.days` or `.nanos` alone. Malformed input must raise for
    EVERY single-child projection."""
    import pytest
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions import codecs

    # '5hx' exercises the assert_true guard itself (a duplicate unit like
    # '5h3h' would raise str_to_map's DUPLICATED_MAP_KEY first under the
    # default EXCEPTION policy, bypassing the code path under test)
    df = spark.createDataFrame([("5hx",)], "s STRING")
    parsed = codecs.cql_duration_parse(F.col("s"))
    for child in ["months", "days", "nanos"]:
        with pytest.raises(Exception, match="malformed CQL duration"):
            df.select(parsed.getField(child).alias("v")).collect()
    # valid input: single-child extraction works and costs no correctness
    ok = spark.createDataFrame([("1y3w2d",)], "s STRING")
    p = codecs.cql_duration_parse(F.col("s"))
    row = ok.select(
        p.getField("months").alias("mo"),
        p.getField("days").alias("d"),
        p.getField("nanos").alias("ns"),
    ).first()
    assert (row.mo, row.d, row.ns) == (12, 23, 0)


def test_duration_rejects_trailing_line_terminator(spark):
    """Round-6 advice: Java regex '$' (non-MULTILINE) matches before a
    final line terminator, so '^...$' accepted '1h\\n'. The \\A...\\z
    anchors must reject any trailing newline/CR variants."""
    import pytest
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions import codecs

    for bad in ["1h\n", "1h\r\n", "1h\r", "\n", "12h30m\n"]:
        df = spark.createDataFrame([(bad,)], "s STRING")
        with pytest.raises(Exception, match="malformed CQL duration"):
            df.select(codecs.cql_duration_parse(F.col("s")).alias("d")).collect()
