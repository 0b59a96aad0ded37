"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The reference engine has no clustering operator; this is a north-star
extension (SURVEY.md §2b) — the trainer that produces the centroid list
`similarity.assign_ivf_cells` / `ivf_topk` consume, and a standard
training-data-pipeline primitive (corpus partitioning, diversity sampling,
IVF index builds).

Execution shape (the one that survives 100 TB):

- Centroids are a small driver-side list (k·dim doubles — kilobytes). Each
  assignment pass ships them inside an Arrow-vectorized kernel
  (assign_clusters_arrow): one numpy batch op per record batch, no shuffle
  of the corpus. (The literal-expression variant `assign_clusters` remains
  for tiny k·dim / no-Python contexts, but its higher-order lambdas are
  interpreted, not codegen'd — the Arrow kernel is the scale path.)
- The update step aggregates per-(cluster, dimension) sums via
  ``posexplode`` + ``groupBy`` — one partial-agg shuffle of k·dim rows per
  iteration, then a bounded ``collect()`` of exactly k·dim rows (the same
  driver-side weight sync every distributed k-means does — this is not a
  driver-side data loop).
- Iteration count is a fixed hyperparameter; the driver only stitches
  iterations together. No RDDs, no Python row loops.

Determinism: init = the k corpus vectors with the smallest ids (explicit,
seedless); distance ties break toward the lower cluster id via struct
ordering. Float sums are order-dependent across partitionings, so downstream
checks round aggregates (the query key is rows-only, per SURVEY §2's
engine-specific designation for iterative ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.vectors import as_double_array


def _sq_dist(v, centroid: list[float]):
    """Squared Euclidean distance between an array column and a literal
    centroid — zip_with + aggregate, all JVM expressions."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(v, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append 'cluster' (int) and 'sq_dist' (double): nearest centroid by
    squared Euclidean distance, ties toward the lower cluster id (struct
    ordering sorts (dist, id) lexicographically)."""
    v = as_double_array(vec_col)
    scored = F.array(
        *[
            F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(scored)
    return df.withColumn("cluster", best["c"]).withColumn("sq_dist", best["d"])


def _assign_arrow_udf(centroids: list[list[float]]):
    """Arrow-vectorized assignment kernel: per record batch, one numpy
    broadcast computes every (row, centroid) squared distance at once. The
    pure-expression path (`assign_clusters`) walks the vector through
    INTERPRETED higher-order lambdas — Catalyst doesn't codegen them — so
    at k=8·dim=64 it does 512 interpreted traversals per row; the same
    lesson as similarity._banded_sigs_arrow (measured ~7× there). Uses the
    identical ((x−c)²).sum formulation as the numpy reference in
    tests/test_cluster.py — no expanded-form cancellation."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)  # (k, dim)

    def _assign(vs: pandas.Series) -> pandas.DataFrame:
        X = np.array(vs.tolist(), dtype=np.float64)
        if len(X) == 0:
            return pandas.DataFrame({"cluster": [], "sq_dist": []})
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        a = d2.argmin(axis=1)  # ties -> lowest index, as struct-order does
        return pandas.DataFrame(
            {"cluster": a.astype("int32"), "sq_dist": d2[np.arange(len(a)), a]}
        )

    _assign.__annotations__ = {"vs": pandas.Series, "return": pandas.DataFrame}
    return pandas_udf(_assign, "cluster int, sq_dist double")


def assign_clusters_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """`assign_clusters` semantics via the Arrow kernel — the declared scale
    path for corpus-sized assignment (one GEMM-shaped batch op instead of
    k·dim interpreted lambda traversals per row)."""
    udf = _assign_arrow_udf(centroids)
    v = as_double_array(vec_col)
    out = df.withColumn("__a", udf(v))
    return out.withColumn("cluster", F.col("__a.cluster")).withColumn(
        "sq_dist", F.col("__a.sq_dist")
    ).drop("__a")


def semdedup_pruned_ids(
    assigned: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "__v",
    cluster_col: str = "cluster_id",
    max_cluster_compare: int = 4096,
) -> DataFrame:
    """SemDeDup's within-cluster prune set: ids having a lower-id member of
    the SAME cluster at rounded cosine ≥ τ. One ``applyInPandas`` per
    cluster — a single numpy GEMM computes the pairwise score matrix for
    that cluster (the reference SemDeDup implementation's shape), vs
    ~|c|²/2 interpreted lambda dot-folds for the expression self-join
    (measured 9.4 s → GEMM ~1 s at sf0.1).

    Mega-cluster cap (round-4 verdict #8, the same degradation contract as
    dedup._bucketed_pairs' star linking): clusters up to
    ``max_cluster_compare`` members get the EXACT all-pairs check; beyond
    that, each member is compared only against the ``max_cluster_compare``
    lowest-id anchor members, so one degenerate cluster costs
    O(|c|·cap·dim) GEMM and O(|c|·cap) memory instead of O(|c|²) — it can
    stall the sweep but not OOM the executor. The only pairs an over-cap
    cluster can miss are those whose BOTH members sit beyond the anchor
    set; deterministic (anchors = lowest ids), and a cluster that big means
    the k-means k was mis-sized for the corpus — resize k rather than raise
    the cap."""
    import numpy as np
    import pandas

    if max_cluster_compare < 2:
        raise ValueError(f"max_cluster_compare must be >= 2, got {max_cluster_compare}")

    def _prune(pdf: pandas.DataFrame) -> pandas.DataFrame:
        pdf = pdf.sort_values(id_col)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        if len(X) < 2:
            return pandas.DataFrame({id_col: []}).astype({id_col: "int64"})
        n_anchor = min(len(X), max_cluster_compare)
        A = X[:n_anchor]
        nx = np.sqrt((X * X).sum(axis=1))
        S = np.round((X @ A.T) / np.outer(nx, nx[:n_anchor]), 4)  # (n, n_anchor)
        # anchor column j IS global row j (both share the id sort), so
        # "lower-id partner" = any anchor j < i scoring >= tau
        lower = np.arange(n_anchor)[None, :] < np.arange(len(X))[:, None]
        hit = ((S >= tau) & lower).any(axis=1)
        return pandas.DataFrame({id_col: pdf[id_col].to_numpy()[hit]})

    return assigned.select(cluster_col, id_col, vec_col).groupBy(cluster_col).applyInPandas(
        _prune, f"{id_col} long"
    )


def _sq_dist_exact(v, centroid: list[float]):
    """Squared Euclidean distance as an EXACT decimal sum: each per-dimension
    squared diff is computed in double (IEEE-identical on any engine), cast
    to DECIMAL(28,12), then summed — order-independent, so an argmin over
    these distances is engine-portable (the plain double fold in `_sq_dist`
    is summation-order-dependent and only safe within one engine)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(v, c, lambda a, b: ((a - b) * (a - b)).cast("decimal(28,12)"))
    return F.aggregate(
        diff,
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, x: (acc + x).cast("decimal(38,12)"),
    )


def assign_clusters_exact(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assignment under FIXED centroids with a portable tie-break: append
    'cluster_id' (the centroid's id) and 'sq_dist' (decimal). Distances are
    exact decimal sums (see _sq_dist_exact) and ties break toward the lower
    centroid id via struct ordering, so an ANSI-SQL oracle doing the same
    argmin agrees bit-for-bit. Same plan shape as `assign_clusters`: the
    argmin is a codegen'd projection over the scan — the corpus is never
    shuffled."""
    v = as_double_array(vec_col)
    scored = F.array(
        *[
            F.struct(_sq_dist_exact(v, vec).alias("d"), F.lit(int(cid)).alias("c"))
            for cid, vec in centroids
        ]
    )
    best = F.array_min(scored)
    return df.withColumn("cluster_id", best["c"].cast("bigint")).withColumn(
        "sq_dist", best["d"]
    )


def lloyd_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Run `iters` Lloyd iterations; return (assigned_df, centroids).

    assigned_df = input + ('cluster', 'sq_dist') under the FINAL centroids.
    Empty clusters keep their previous centroid (the standard fallback).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    init_rows = df.orderBy(F.col(id_col)).limit(k).select(as_double_array(vec_col).alias("v")).collect()
    if not init_rows:
        raise ValueError("cannot seed k-means from an empty input")
    centroids = [list(r["v"]) for r in init_rows]
    dim = len(centroids[0])
    base = df.select(F.col(id_col), as_double_array(vec_col).alias("__v"))
    for _ in range(iters):
        assigned = assign_clusters_arrow(base, centroids, "__v")
        # per-(cluster, dim) partial sums: one shuffle of ≤ k·dim rows out
        sums = (
            assigned.select("cluster", F.posexplode(F.col("__v")).alias("pos", "x"))
            .groupBy("cluster", "pos")
            # DECIMAL sums: double addition is order-dependent across
            # partitions, which would make the trained centroids (and every
            # downstream IVF bucket assignment) vary run-to-run; a 15-digit
            # fixed-point sum is exact and order-independent. The cast is
            # non-ANSI (NaN/Inf/overflow → NULL), which would SILENTLY skew
            # the mean while count still counts the row — so non-castable
            # components are counted explicitly and raised loudly.
            .agg(
                F.sum(F.col("x").cast("decimal(30,15)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("x").cast("decimal(30,15)").isNull(), 1).otherwise(0)
                ).alias("n_bad"),
            )
        )
        rows = sums.collect()  # exactly ≤ k·dim rows — bounded weight sync
        bad = sum(r["n_bad"] for r in rows)
        if bad:
            raise ValueError(
                f"k-means input contains {bad} non-finite/overflow vector "
                "component(s) — clean or clip embeddings before training"
            )
        new = [list(c) for c in centroids]
        for r in rows:
            new[r["cluster"]][r["pos"]] = float(r["s"]) / r["n"]
        centroids = new
    return assign_clusters_arrow(df, centroids, vec_col), centroids


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster summary: size + rounded mean squared distance (inertia
    contribution). One partial-agg shuffle of k rows."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.round(F.avg("sq_dist"), 4).alias("mean_sq_dist"),
        )
        .orderBy("cluster")
    )
