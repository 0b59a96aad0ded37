"""Deterministic token ring functions.

CDM parallelizes by Murmur3 token ranges over [-2^63, 2^63-1] (SURVEY.md §1.1,
[upstream@6.0.1] SplitPartitions; ring context /root/reference/entrypoint.sh:278).
Murmur3 is not reproducible in the DuckDB oracle, so the fixtures define a
Knuth multiplicative-hash token over a 32-bit ring (FIXTURES.md):

    tok(k) = ((k * 2654435761) % 4294967296) - 2147483648

All arithmetic stays in BIGINT (keys up to ~1e7 keep the product well under
2^63) so Spark and DuckDB produce bit-identical tokens. Slice widths are powers
of two, so the double division inside ``floor`` is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_MULTIPLIER = 2654435761
TOKEN_MODULUS = 4294967296  # 2^32 ring
TOKEN_MIN = -2147483648
TOKEN_MAX = 2147483647


def tok(key: Column | str) -> Column:
    """Token of a partition-key column (BIGINT, in [-2^31, 2^31))."""
    c = F.col(key) if isinstance(key, str) else key
    return (c * F.lit(TOKEN_MULTIPLIER)) % F.lit(TOKEN_MODULUS) + F.lit(TOKEN_MIN)


def tok_sql(key: str) -> str:
    """Same token expression as ANSI SQL (for the DuckDB oracle)."""
    return f"((({key} * {TOKEN_MULTIPLIER}) % {TOKEN_MODULUS}) - {-TOKEN_MIN})"


def pmod_100(c: Column) -> Column:
    """Positive modulo 100 (Spark/DuckDB `%` are both sign-of-dividend, so
    normalize: ((x % 100) + 100) % 100)."""
    return ((c % 100) + 100) % 100


def pmod_100_sql(expr: str) -> str:
    return f"(((({expr}) % 100) + 100) % 100)"


def slice_width(num_slices: int) -> int:
    if TOKEN_MODULUS % num_slices:
        raise ValueError(f"num_slices must divide 2^32, got {num_slices}")
    return TOKEN_MODULUS // num_slices


def slice_id(token: Column, num_slices: int) -> Column:
    """Bucket a token into one of ``num_slices`` contiguous ring ranges (the
    SplitPartitions analog, SURVEY.md §2 #25)."""
    return F.floor((token - F.lit(TOKEN_MIN)) / F.lit(slice_width(num_slices))).cast("bigint")


def slice_id_sql(token_expr: str, num_slices: int) -> str:
    return f"((({token_expr}) - ({TOKEN_MIN})) // {slice_width(num_slices)})"


def slice_bounds(num_slices: int) -> list[tuple[int, int, int]]:
    """Driver-side slice manifest: (slice_id, min_token, max_token) — the
    partition-file / run-tracking unit (SURVEY.md §2 #5/#6)."""
    w = slice_width(num_slices)
    return [(i, TOKEN_MIN + i * w, TOKEN_MIN + (i + 1) * w - 1) for i in range(num_slices)]
