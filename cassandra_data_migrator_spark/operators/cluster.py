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
    the SAME cluster at rounded cosine ≥ τ. ``applyInPandas`` GEMM groups —
    a single numpy matmul computes the chunk's score matrix (the reference
    SemDeDup implementation's shape), vs ~|c|²/2 interpreted lambda
    dot-folds for the expression self-join (measured 9.4 s → GEMM ~1 s at
    sf0.1).

    Mega-cluster cap + re-split (round-4 verdict #8 / round-11 verdict #1,
    the same degradation contract as dedup's simhash hot-bucket cascade):

    - ANCHORS = the ``max_cluster_compare`` lowest-id members of each
      cluster; a member is pruned iff some LOWER-ID ANCHOR scores ≥ τ.
      For clusters ≤ cap this is the exact all-pairs-lower check (every
      member is an anchor); beyond the cap the only pairs missed are those
      whose BOTH members sit past the anchor set — deterministic, and a
      cluster that big means k was mis-sized for the corpus.
    - GROUP RE-SPLIT: members are chunked ``cap`` at a time by their
      per-cluster id rank, and the anchor rows are REPLICATED into every
      later chunk, so one pandas group holds ≤ 2·cap rows and one GEMM is
      ≤ cap×cap NO MATTER how degenerate the cluster — a cluster holding
      half the corpus costs |c|/cap bounded tasks, never one executor-OOM
      group (the pre-r12 shape put the whole cluster in a single group and
      only capped the GEMM's anchor dimension). Anchor replication totals
      ≤ |c| extra rows per over-cap cluster and is ZERO rows when no
      cluster exceeds the cap.

    Plan: one window (row_number per cluster — WindowExec's sort is
    external/spillable, so ranking a mega-cluster spills instead of
    OOMing), a broadcast join of the k-row chunk-count table, and the
    (cluster, chunk) groupBy shuffle. Pinned by
    tests/test_cluster.py::test_semdedup_megacluster_resplit (one cluster
    holding 50% of all vectors; per-group boundedness + semantics vs the
    unchunked reference)."""
    import numpy as np
    import pandas

    if max_cluster_compare < 2:
        raise ValueError(f"max_cluster_compare must be >= 2, got {max_cluster_compare}")

    grouped = _semdedup_groups(
        assigned, id_col, vec_col, cluster_col, max_cluster_compare
    )
    tau = float(tau)

    def _prune(pdf: pandas.DataFrame) -> pandas.DataFrame:
        a = pdf[pdf["__is_anchor"] == 1].sort_values(id_col)
        m = pdf[pdf["__is_member"] == 1].sort_values(id_col)
        if len(a) == 0 or len(m) == 0:
            return pandas.DataFrame({id_col: []}).astype({id_col: "int64"})
        A = np.array(a[vec_col].tolist(), dtype=np.float64)
        X = np.array(m[vec_col].tolist(), dtype=np.float64)
        na = np.sqrt((A * A).sum(axis=1))
        nx = np.sqrt((X * X).sum(axis=1))
        S = np.round((X @ A.T) / np.outer(nx, na), 4)  # (|chunk|, |anchors|)
        lower = (
            a[id_col].to_numpy()[None, :] < m[id_col].to_numpy()[:, None]
        )
        hit = ((S >= tau) & lower).any(axis=1)
        return pandas.DataFrame({id_col: m[id_col].to_numpy()[hit]})

    return grouped.groupBy(cluster_col, "__chunk").applyInPandas(
        _prune, f"{id_col} long"
    )


def semdedup_flags(
    assigned: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "__v",
    cluster_col: str = "cluster_id",
    max_cluster_compare: int = 4096,
) -> DataFrame:
    """SemDeDup prune decision for EVERY row: (id, cluster, is_pruned),
    exactly `semdedup_pruned_ids` membership (pinned by
    tests/test_cluster.py::test_semdedup_flags_matches_pruned_ids).

    Optimization-r12 shape (guide §2.4 "remove shuffles outright"): the old
    consumer pattern — `assigned LEFT JOIN pruned_ids` to derive the flag —
    re-evaluates the `assigned` subtree on BOTH join branches. When the
    assignment is the expensive exact-decimal argmin (q_semantic_dedup),
    that doubles the dominant cost and adds a join exchange. Every chunk
    group already holds each member row exactly once, so the GEMM kernel
    can emit the flag for every member directly: ONE evaluation of
    `assigned`, zero joins downstream."""
    import numpy as np
    import pandas

    if max_cluster_compare < 2:
        raise ValueError(f"max_cluster_compare must be >= 2, got {max_cluster_compare}")

    grouped = _semdedup_groups(
        assigned, id_col, vec_col, cluster_col, max_cluster_compare
    )
    tau = float(tau)

    def _flags(pdf: pandas.DataFrame) -> pandas.DataFrame:
        a = pdf[pdf["__is_anchor"] == 1].sort_values(id_col)
        m = pdf[pdf["__is_member"] == 1].sort_values(id_col)
        if len(m) == 0:
            return pandas.DataFrame(
                {id_col: [], cluster_col: [], "is_pruned": []}
            ).astype({id_col: "int64", cluster_col: "int64", "is_pruned": "bool"})
        if len(a) == 0:
            hit = np.zeros(len(m), dtype=bool)
        else:
            A = np.array(a[vec_col].tolist(), dtype=np.float64)
            X = np.array(m[vec_col].tolist(), dtype=np.float64)
            na = np.sqrt((A * A).sum(axis=1))
            nx = np.sqrt((X * X).sum(axis=1))
            S = np.round((X @ A.T) / np.outer(nx, na), 4)
            lower = (
                a[id_col].to_numpy()[None, :] < m[id_col].to_numpy()[:, None]
            )
            hit = ((S >= tau) & lower).any(axis=1)
        return pandas.DataFrame(
            {
                id_col: m[id_col].to_numpy(),
                cluster_col: m[cluster_col].to_numpy(),
                "is_pruned": hit,
            }
        )

    return grouped.groupBy(cluster_col, "__chunk").applyInPandas(
        _flags, f"{id_col} long, {cluster_col} long, is_pruned boolean"
    )


def _semdedup_groups(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    cap: int,
) -> DataFrame:
    """The bounded (cluster, chunk) group layout `semdedup_pruned_ids`
    GEMMs over — split out so tests can assert the boundedness invariant
    directly: every (cluster, chunk) group holds ≤ 2·cap rows (≤ cap
    member rows + ≤ cap replicated anchor rows).

    One evaluation of `assigned`, one shuffle: the per-cluster rank AND
    size are two window functions over the SAME partition spec (one
    exchange, stacked window execs — no second pass over the expensive
    assignment), and anchor replication is a single explode — anchor rows
    (rank ≤ cap, hence chunk 0) emit one copy per chunk of their cluster,
    everything else emits itself once."""
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(id_col)
    wall = Window.partitionBy(cluster_col)
    ranked = (
        assigned.select(cluster_col, id_col, vec_col)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__max_chunk",
            F.floor((F.count(F.lit(1)).over(wall) - 1) / cap).cast("int"),
        )
    )
    own = F.floor((F.col("__rn") - 1) / cap).cast("int")
    emit = F.when(
        F.col("__rn") <= cap,
        F.sequence(F.lit(0), F.col("__max_chunk")),
    ).otherwise(F.array(own))
    return ranked.select(
        cluster_col,
        id_col,
        vec_col,
        own.alias("__own"),
        (F.col("__rn") <= cap).cast("int").alias("__is_anchor"),
        F.explode(emit).alias("__chunk"),
    ).select(
        cluster_col,
        id_col,
        vec_col,
        "__chunk",
        "__is_anchor",
        (F.col("__chunk") == F.col("__own")).cast("int").alias("__is_member"),
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


def _assign_exact_arrow_udf(centroids: list[tuple[int, list[float]]]):
    """Arrow-vectorized kernel computing EXACTLY `assign_clusters_exact`'s
    decimal argmin (optimization r12, guide §4.2: batch the work into numpy
    instead of per-row interpreted lambda folds — the expression form walks
    k·dim CodegenFallback HOF steps per row, measured ~1 ms/row at k=8,
    dim=64).

    Bit-exactness: the engine's decimal fold is, per (row, centroid):

      t_j  = CAST((v_j − c_j)² AS DECIMAL(28,12))      -- HALF_UP of the
                                                        -- double's shortest
                                                        -- decimal repr
      acc  = CAST(acc + t_j AS DECIMAL(38,12))          -- the Add itself is
                                                        -- typed DECIMAL(38,11),
                                                        -- so EVERY partial sum
                                                        -- rounds HALF_UP at
                                                        -- 1e-11 (verified
                                                        -- empirically, pinned
                                                        -- by the identity test)

    The kernel replicates this in integer 1e-12 quanta: (v_j − c_j)² is the
    same IEEE double numpy computes; its quantization to 12dp is done with
    np.round on d·1e12, EXCEPT terms whose scaled value falls within a
    provable error window of a .5 boundary (window = float error of the
    d·1e12 product + the double's own repr half-ulp), which are re-done with
    Python Decimal(repr(d)) — the exact JVM BigDecimal.valueOf semantics.
    The per-step 1e-11 rounding is integer arithmetic ((acc + t + 5)//10*10),
    exact by construction. Argmin ties break to the lowest centroid id via
    first-minimum over ascending-cid columns, matching struct ordering.
    Identity vs the expression path is pinned by
    tests/test_cluster.py::test_assign_exact_arrow_identity (full
    enumeration of the fixture corpus)."""
    import numpy as np
    import pandas
    from decimal import ROUND_HALF_UP, Decimal
    from pyspark.sql.functions import pandas_udf

    cents = sorted(((int(cid), list(map(float, cv))) for cid, cv in centroids))
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)  # (k, dim)
    Q12 = Decimal("1e-12")

    def _assign(vs: pandas.Series) -> pandas.DataFrame:
        if len(vs) == 0:
            return pandas.DataFrame({"cluster_id": [], "sq_dist": []}).astype(
                {"cluster_id": "int64", "sq_dist": "object"}
            )
        X = np.array(vs.tolist(), dtype=np.float64)  # raises on ragged input
        diff = X[:, None, :] - C[None, :, :]
        dsq = diff * diff                                   # (n, k, dim)
        y = dsq * 1e12
        t = np.round(y)
        # terms whose 12dp HALF_UP could disagree with the float fast path:
        # within (product rounding + repr half-ulp) of a .5 quantum boundary
        frac = y - np.floor(y)
        window = (np.spacing(y) + np.spacing(dsq) * 1e12) / 2.0 + 1e-3
        risky = np.abs(frac - 0.5) < window
        if risky.any():
            flat = dsq[risky]
            t[risky] = [
                float(
                    Decimal(repr(float(d))).quantize(Q12, rounding=ROUND_HALF_UP)
                    .scaleb(12)
                )
                for d in flat
            ]
        ti = t.astype(np.int64)                             # quanta of 1e-12
        acc = np.zeros(ti.shape[:2], dtype=np.int64)
        for j in range(ti.shape[2]):                        # the engine's fold,
            acc = (acc + ti[:, :, j] + 5) // 10 * 10        # 1e-11 per step
        a = acc.argmin(axis=1)                              # first min = low cid
        win = acc[np.arange(len(a)), a]
        return pandas.DataFrame(
            {
                "cluster_id": cids[a],
                "sq_dist": [Decimal(int(w)).scaleb(-12) for w in win],
            }
        )

    _assign.__annotations__ = {"vs": pandas.Series, "return": pandas.DataFrame}
    return pandas_udf(_assign, "cluster_id bigint, sq_dist decimal(38,12)")


def assign_clusters_exact_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """`assign_clusters_exact` semantics (same columns, bit-identical
    values) through the Arrow kernel — the declared scale path for
    corpus-sized exact assignment."""
    udf = _assign_exact_arrow_udf(centroids)
    v = as_double_array(vec_col)
    out = df.withColumn("__a", udf(v))
    return (
        out.withColumn("cluster_id", F.col("__a.cluster_id"))
        .withColumn("sq_dist", F.col("__a.sq_dist"))
        .drop("__a")
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
