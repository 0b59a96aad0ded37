"""Codec conversions (SURVEY.md §2 #10; CDM's com.datastax.cdm.cql.codec.*
registry, [upstream@6.0.1], pinned via /root/reference/Dockerfile:60-61).

CDM ships a closed set of origin→target type coercions. Spark expresses each as
a Column expression that whole-stage codegen vectorizes — no per-row Java loop.
Determinism notes (oracle parity):

- double→string formatting differs subtly across engines, so numeric→string
  goes through DECIMAL first (identical canonical text on both sides);
- timestamp→millis uses integer µs DIV 1000 (truncation, matches DuckDB
  epoch_ms of a µs-truncated timestamp);
- timestamp→string uses an explicit format + session TZ pinned to UTC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# numeric <-> string


def int_to_string(c: Column) -> Column:
    return c.cast("string")


def string_to_bigint(c: Column) -> Column:
    return c.cast("bigint")


def double_to_string(c: Column, precision: int = 18, scale: int = 2) -> Column:
    """Canonical decimal text (e.g. '123.45') — identical in Spark and DuckDB,
    unlike raw double formatting."""
    return c.cast(f"decimal({precision},{scale})").cast("string")


def decimal_to_string(c: Column) -> Column:
    return c.cast("string")


# ---------------------------------------------------------------------------
# timestamp codecs (CDM CqlToStringCodec family)


def timestamp_to_millis(ts_us: Column) -> Column:
    """Epoch-µs BIGINT → epoch-ms BIGINT. Subtract-then-divide keeps the
    arithmetic integral (exact in double, then cast back) for positive epochs."""
    return ((ts_us - (ts_us % 1000)) / 1000).cast("bigint")


def timestamp_to_string(ts: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Format in the session timezone (engine pins UTC)."""
    return F.date_format(ts, fmt)


def string_to_timestamp(c: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.to_timestamp(c, fmt)


# ---------------------------------------------------------------------------
# CQL duration codec (SURVEY.md §1.2: duration = (months, days, nanos) — the
# one CQL type with no single-integer encoding; no DuckDB oracle exists, so
# coverage is pytest-level by design)

_DUR_UNITS_NANOS = {
    "h": 3_600_000_000_000,
    "m": 60_000_000_000,
    "s": 1_000_000_000,
    "ms": 1_000_000,
    "us": 1_000,
    "ns": 1,
}


def cql_duration_parse(c: Column) -> Column:
    """Parse a CQL duration string ('1y2mo3w4d5h6m7s8ms9us10ns') into the
    canonical struct(months INT, days INT, nanos BIGINT) — Cassandra's wire
    triple. ONE regex scan: '5h3m' → 'h:5,m:3' → str_to_map → unit lookups,
    all codegen'd (measured 1.4× the 10-regexp_extract formulation this
    replaces, bit-identical on the fixture corpus). The alternation orders
    'mo|ms|us|ns' before the single-letter units so the m/mo/ms ambiguity
    resolves exactly as Cassandra's parser does. Month/day/sub-day
    components deliberately do NOT normalize into each other (calendar
    semantics). Malformed input raises regardless of session conf
    (round-4 advice): a repeated unit is rejected by an explicit
    map-size-vs-match-count assert (so the contract no longer depends on
    spark.sql.mapKeyDedupPolicy being EXCEPTION — LAST_WIN would otherwise
    silently keep the last occurrence), and any residue the tokenizer did
    not consume ('5hx', '1h 2m', 'h5') fails a whole-string check instead
    of being silently dropped."""
    # `mapped` is the ONE tokenizing regex pass; every consumer below —
    # the map, the entry count, and the shape check — derives from it, so
    # whole-stage codegen's subexpression elimination materializes it once
    # per row. Keeping every struct child UNCONDITIONAL matters just as
    # much: wrapping the struct in when(guard, ...) marks all children
    # conditionally-evaluated, which disables CSE and re-ran the regex
    # pipeline per field (measured 12× in the r05 sweep).
    mapped = F.regexp_replace(c, r"(\d+)(mo|ms|us|ns|y|w|d|h|m|s)", r"$2:$1,")
    m = F.str_to_map(
        F.regexp_replace(mapped, r",\z", ""), F.lit(","), F.lit(":")
    )

    def u(k: str) -> Column:
        # absent unit → null lookup → 0 (try_cast keeps ANSI mode happy)
        return F.coalesce(F.element_at(m, k).try_cast("bigint"), F.lit(0))

    nanos = (
        u("h") * F.lit(_DUR_UNITS_NANOS["h"])
        + u("m") * F.lit(_DUR_UNITS_NANOS["m"])
        + u("s") * F.lit(_DUR_UNITS_NANOS["s"])
        + u("ms") * F.lit(_DUR_UNITS_NANOS["ms"])
        + u("us") * F.lit(_DUR_UNITS_NANOS["us"])
        + u("ns") * F.lit(_DUR_UNITS_NANOS["ns"])
    )
    # The whole-string shape check MUST anchor on the ORIGINAL column:
    # checking the post-tokenization string instead would accept input
    # that mimics tokenizer output ('y:1,' or 'h:5,' pass a mapped-form
    # regex yet are not valid CQL durations — caught in round-5 review).
    # The duplicate-unit check still derives from `mapped`: the
    # matched-token count is the comma count (plain string ops), and a
    # repeated unit makes map size < token count regardless of
    # spark.sql.mapKeyDedupPolicy.
    # \A..\z, not ^..$: Java regex '$' (non-MULTILINE) matches before a
    # trailing line terminator, so '1h\n' would pass an ^..$ whole-string
    # check (round-5 advice) — \z anchors at the true end of input.
    shape_ok = c.rlike(r"\A(\d+(?:mo|ms|us|ns|y|w|d|h|m|s))*\z")
    entries = F.length(mapped) - F.length(F.replace(mapped, F.lit(","), F.lit("")))
    no_dup = F.size(m) == entries
    guard0 = F.coalesce(
        F.assert_true(
            # '' is the zero duration (str_to_map('') yields a 1-entry map
            # with an empty key, so the size compare needs the carve-out)
            c.isNull() | (c == "") | (shape_ok & no_dup),
            F.concat(
                F.lit("malformed CQL duration: "), F.coalesce(c, F.lit("null"))
            ),
        ).cast("int"),
        F.lit(0),
    )
    # guard0 rides on EVERY child: Catalyst's SimplifyExtractValueOps
    # rewrites GetStructField(CreateNamedStruct(...)) to just the extracted
    # child, so a consumer reading only .days or .nanos would skip a guard
    # attached to months alone (round-5 advice). guard0 is a common
    # subexpression, so CSE keeps the cost of the three copies identical
    # to one.
    return F.struct(
        (u("y") * 12 + u("mo") + guard0).cast("int").alias("months"),
        (u("w") * 7 + u("d") + guard0).cast("int").alias("days"),
        (nanos + guard0).cast("bigint").alias("nanos"),
    )


def cql_duration_format(dur: Column) -> Column:
    """Canonical text of a duration struct: months→'Xmo', days→'Xd',
    nanos→'Xns' (flat units, reversible with cql_duration_parse)."""
    return F.concat(
        F.when(dur.months > 0, F.concat(dur.months.cast("string"), F.lit("mo"))).otherwise(F.lit("")),
        F.when(dur.days > 0, F.concat(dur.days.cast("string"), F.lit("d"))).otherwise(F.lit("")),
        F.when(dur.nanos > 0, F.concat(dur.nanos.cast("string"), F.lit("ns"))).otherwise(F.lit("")),
    )


def timestamp_add_duration(ts: Column, dur: Column) -> Column:
    """Shift a timestamp by a duration struct: calendar months first, then
    days, then the sub-day nano component truncated to Spark's µs precision
    (Cassandra's application order; add_months alone would drop time-of-day)."""
    with_calendar = ts + F.make_interval(months=dur.months) + F.make_dt_interval(days=dur.days)
    us = (dur.nanos / F.lit(1000)).cast("bigint")
    return F.timestamp_micros(F.unix_micros(with_calendar) + us)


# ---------------------------------------------------------------------------
# inet / timeuuid codecs (SURVEY.md §1.2: inet → dotted-quad string,
# timeuuid → canonical v1 text; all arithmetic is portable integer div/mod so
# the DuckDB oracle reproduces it bit-for-bit — no engine bit operators)

GREGORIAN_OFFSET_100NS = 122_192_928_000_000_000  # 1582-10-15 → 1970-01-01


def _hex_field(c: Column, width: int) -> Column:
    return F.lpad(F.lower(F.hex(c)), width, "0")


def inet_from_int(c: Column) -> Column:
    """IPv4 dotted-quad text from a BIGINT in [0, 2^32)."""
    return F.concat_ws(
        ".",
        (c / 16777216).cast("bigint").cast("string"),
        ((c / 65536).cast("bigint") % 256).cast("string"),
        ((c / 256).cast("bigint") % 256).cast("string"),
        (c % 256).cast("string"),
    )


def timeuuid_from_parts(ts_us: Column, clock_seq: Column, node: Column) -> Column:
    """Canonical RFC-4122 v1 (timeuuid) text from an epoch-µs timestamp, a
    14-bit clock sequence, and a 48-bit node id: 60-bit timestamp in 100 ns
    units since the Gregorian epoch, split little-endian-by-field into
    time_low / time_mid / time_hi+version, variant bits on clock_seq_hi."""
    t = ts_us * 10 + F.lit(GREGORIAN_OFFSET_100NS)
    # Exact bigint field splits: Spark `/` is double division, and t ≈ 1.4e17
    # exceeds 2^53, so (t / 2^32) can round to the wrong quotient when t is
    # within a few ULPs of a multiple of 2^32. Subtract the remainder first so
    # every numerator is an exact multiple (< 2^48 resp. a small multiple of
    # 2^48), which doubles represent exactly — bit-identical to integer `//`.
    time_low = t % F.lit(4294967296)
    time_mid = ((t % F.lit(281474976710656) - time_low) / F.lit(4294967296)).cast("bigint")
    time_hi = ((t - t % F.lit(281474976710656)) / F.lit(281474976710656)).cast("bigint") % F.lit(
        4096
    ) + F.lit(0x1000)
    cs = clock_seq % F.lit(16384) + F.lit(0x8000)  # variant 10xx
    nd = node % F.lit(281474976710656)
    return F.concat_ws(
        "-",
        _hex_field(time_low, 8),
        _hex_field(time_mid, 4),
        _hex_field(time_hi, 4),
        _hex_field(cs, 4),
        _hex_field(nd, 12),
    )


# ---------------------------------------------------------------------------
# blob codecs


def blob_to_hex(c: Column) -> Column:
    return F.lower(F.hex(c))


def blob_to_base64(c: Column) -> Column:
    return F.base64(c)


def string_to_blob(c: Column) -> Column:
    return c.cast("binary")
