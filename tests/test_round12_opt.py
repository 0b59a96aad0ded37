"""Round-12 optimization identity contracts (this session's batch).

Each optimization that rewrites an operator's internals pins bit-identity
against the pre-optimization path over the full fixture corpus, the
test_cluster/test_sq8/test_similarity discipline."""

import math

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.vectors import as_double_array
from cassandra_data_migrator_spark.sources.parquet import load_table


def _bit_eq(a: float, b: float) -> bool:
    return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)


def test_jl_kernel_bit_identity(spark, sf_dir):
    """The Arrow JL projection kernel reproduces the expression path's
    decimal fold value-for-value over every fixture embedding — including
    the signed per-step 1e-11 HALF_UP rounding the fold's DECIMAL(38,11)
    Add applies."""
    from cassandra_data_migrator_spark.queries import ann_pq

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double_array("embedding").alias("__x"))
    ref = {
        r["vec_id"]: r["__y"]
        for r in ann_pq._jl_project_expr(base, ann_pq._jl_matrix(spark)).collect()
    }
    ker = {
        r["vec_id"]: r["__y"]
        for r in base.withColumn(
            "__y", ann_pq._jl_project_udf_factory()(F.col("__x"))
        )
        .select("vec_id", "__y")
        .collect()
    }
    assert ref.keys() == ker.keys() and len(ref) > 0
    for vid, want in ref.items():
        got = ker[vid]
        assert len(want) == len(got) == ann_pq.JL_DIM_OUT
        for w, g in zip(want, got):
            assert _bit_eq(w, g), (vid, want, got)


def test_ngram_scored_artifact_matches_direct_derivation(spark, sf_dir):
    """Filtering the shared scored pair artifact at a consumer threshold
    is row-identical (ids AND 4dp jaccard) to deriving
    ngram_jaccard_pairs at that threshold directly."""
    from cassandra_data_migrator_spark.operators import dedup
    from cassandra_data_migrator_spark.queries import dedup_text

    direct = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            load_table(spark, sf_dir, "documents"),
            n=dedup_text.NGRAM_N,
            threshold=dedup_text.NGRAM_THRESHOLD,
        ).collect()
    }
    shared = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup_text._ngram_scored_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= dedup_text.NGRAM_THRESHOLD)
        .collect()
    }
    assert direct == shared and len(shared) > 0
