"""Unit tests for the round-4 operators: content-defined chunking, the
wide-partition guardrail / skew stats, and exact-decimal k-means assignment.
The end-to-end query keys are covered by test_oracle_parity; these pin the
operator semantics on handcrafted inputs where the expected output is
computed by hand."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.cluster import assign_clusters_exact
from cassandra_data_migrator_spark.operators.dedup import content_defined_chunks
from cassandra_data_migrator_spark.operators.guardrail import (
    partition_key_stats,
    partition_rows_guardrail,
)


def _is_boundary(word: str) -> bool:
    return hashlib.md5(word.encode()).hexdigest().startswith("0")


def test_content_chunks_match_reference_impl(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {
        (r.chunk_seq): (r.n_tokens, r.chunk_hash)
        for r in content_defined_chunks(df).collect()
    }
    # reference: boundary token ENDS a chunk
    chunks, cur = [], []
    for w in text.lower().split():
        cur.append(w)
        if _is_boundary(w):
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    assert len(out) == len(chunks)
    for seq, words in enumerate(chunks):
        exp_hash = hashlib.md5(" ".join(words).encode()).hexdigest()
        assert out[seq] == (len(words), exp_hash)


def test_content_chunks_stable_under_insertion(spark):
    """The CDC property: inserting a token changes only the chunk it lands
    in — every chunk before/after keeps its hash (fixed-stride chunking
    would shift all downstream chunks)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    edited = base.replace("zeta eta", "zeta INSERTED eta", 1)
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = content_defined_chunks(df).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    # at most one chunk differs between the originals and the edited doc on
    # each side (the chunk containing the insertion)
    assert len(h1 - h2) <= 1 and len(h2 - h1) <= 1
    assert h1 & h2, "no shared chunks — boundaries not content-defined"


def test_partition_rows_guardrail_flags_wide_partition(spark):
    rows = [(1, "x" * 10) for _ in range(5)] + [(2, "y" * 10)] + [(3, "z" * 500)]
    df = spark.createDataFrame(rows, "pk long, payload string")
    out = partition_rows_guardrail(
        df, ["pk"], F.octet_length("payload").cast("bigint"), max_rows=3, max_bytes=400
    ).collect()
    got = {r.pk: (r.part_rows, r.part_bytes) for r in out}
    assert got == {1: (5, 50), 3: (1, 500)}  # pk=1 by rows, pk=3 by bytes


def test_partition_key_stats_order_and_ratio(spark):
    rows = [(1, "a")] * 6 + [(2, "b")] * 3 + [(3, "c")] * 3
    df = spark.createDataFrame(rows, "pk long, payload string")
    out = partition_key_stats(
        df, ["pk"], F.octet_length("payload").cast("bigint"), top_n=2
    ).collect()
    assert [(r.pk, r.part_rows) for r in out] == [(1, 6), (2, 3)]  # desc, pk tiebreak
    assert out[0].skew_ratio == 1.5  # 6 / mean(4)


def test_assign_clusters_exact_argmin_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 1.0]), (12, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    got = {
        r.vec_id: r.cluster_id
        for r in assign_clusters_exact(df, cents, "embedding").collect()
    }
    # (0.5,0.5) is equidistant — tie breaks toward the LOWER centroid id
    assert got == {10: 0, 11: 1, 12: 0}
