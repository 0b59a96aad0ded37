"""r12 optimization contracts for operators/similarity.py kernels."""

import pytest
from pyspark.sql import functions as F


def test_bucket_sig_kernel_bit_identity(spark, sf_dir):
    """The Arrow banded-signature/norm kernel is BIT-IDENTICAL to the
    interpreted expression path (_bucket_sig per band + norm) on the whole
    fixture corpus — signs of near-zero dots included, because the kernel
    replicates the fold's sequential IEEE op order."""
    from cassandra_data_migrator_spark.functions.vectors import (
        as_double_array,
        norm,
    )
    from cassandra_data_migrator_spark.operators.similarity import (
        _bucket_sig,
        _bucket_sig_norm_arrow,
    )

    dim, num_planes, num_bands, seed = 64, 8, 4, 7
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = as_double_array("embedding")

    expr_rows = {
        r.vec_id: (list(r.sigs), r.vnorm)
        for r in emb.select(
            "vec_id",
            F.array(
                *[
                    _bucket_sig(v, dim, num_planes, seed + 1000 * b)
                    for b in range(num_bands)
                ]
            ).alias("sigs"),
            norm(v).alias("vnorm"),
        ).collect()
    }
    kern = _bucket_sig_norm_arrow(dim, num_planes, num_bands, seed)
    kern_rows = {
        r.vec_id: (list(r.k.buckets), r.k.vnorm)
        for r in emb.select("vec_id", kern(v).alias("k")).collect()
    }
    assert set(expr_rows) == set(kern_rows)
    for vid, (sigs_e, norm_e) in expr_rows.items():
        sigs_k, norm_k = kern_rows[vid]
        assert sigs_e == sigs_k, vid
        assert norm_e == norm_k, vid  # exact, not approx


def test_cosine_near_dup_bucketed_matches_expression_path(spark, sf_dir):
    """cosine_near_dup_bucketed (kernel path) emits exactly the pair set and
    scores the pre-r12 expression path produced: re-derive the pairs through
    the expression signatures and compare full rows."""
    from cassandra_data_migrator_spark.functions.vectors import (
        as_double_array,
        dot,
        norm,
    )
    from cassandra_data_migrator_spark.operators.dedup import _bucketed_pairs
    from cassandra_data_migrator_spark.operators.similarity import (
        _bucket_sig,
        cosine_near_dup_bucketed,
    )

    dim, num_planes, num_bands, seed, thr, cap = 64, 8, 4, 7, 0.3, 256
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    got = {
        (r.id_a, r.id_b): r.score_r
        for r in cosine_near_dup_bucketed(emb, threshold=thr).collect()
    }

    base = emb.select(
        F.col("vec_id"), as_double_array("embedding").alias("vec")
    ).withColumn("vnorm", norm(F.col("vec")))
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _bucket_sig(F.col("vec"), dim, num_planes, seed + 1000 * b).alias(
                    "bucket"
                ),
            )
            for b in range(num_bands)
        ]
    )
    banded = base.select(F.col("vec_id"), F.explode(bands_arr).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    pairs = _bucketed_pairs(banded, "vec_id", ["band", "bucket"], cap)
    va = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("vnorm").alias("norm_a"),
    )
    vb = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("vnorm").alias("norm_b"),
    )
    want = {
        (r.id_a, r.id_b): r.score_r
        for r in (
            pairs.join(va, "id_a")
            .join(vb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(
                    dot(F.col("vec_a"), F.col("vec_b"))
                    / (F.col("norm_a") * F.col("norm_b")),
                    4,
                ).alias("score_r"),
            )
            .filter(F.col("score_r") >= thr)
        ).collect()
    }
    assert got == want
    assert len(got) > 0  # fixture plants near-dups; empty would be vacuous
