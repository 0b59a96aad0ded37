"""Mergeable-sketch operators with self-auditing contracts.

At 100 TB, exact global statistics (distinct counts, quantiles, heavy
hitters) either need a full shuffle on the aggregated key or a sketch.
Spark 4 ships the Apache DataSketches family as builtin aggregates
(``hll_sketch_agg`` / ``hll_union_agg``, ``approx_top_k_accumulate`` /
``_combine`` / ``_estimate``) plus the GK-style ``percentile_approx`` —
all *mergeable*: each token-range slice builds a small partial sketch
map-side, and only the sketches (bytes, not rows) cross the wire. That is
the same partial-agg shape the slice-digest validation plan uses
(plans/validate_incremental.py), applied to analytics.

Every operator here is an AUDIT, following the recall-audit pattern
(queries.q_ann_recall_audit): it runs the sketch path AND the exact path
and emits booleans pinning the sketch's published error bound, plus the
exact values. The DuckDB oracle recomputes the exact columns and asserts
the booleans TRUE — so a regression in the sketch plumbing (empty merge,
collapsed buckets, wrong error) fails the driver's hash check, not just a
bench number.

Reference: CDM has no sketch surface (the reference repo is packaging for
the CDM jar — SURVEY.md §0.1); these are §2b north-star extensions for
the training-data-pipeline profile (corpus cardinality, length quantiles,
hot-key detection before a skewed join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.partition import with_slice

HLL_LG_K = 14  # DataSketches lgConfigK: ~0.8% rel. std. error
HLL_REL_ERR = 0.05  # audited bound — 6 sigma of the sketch's published error
APPROX_PCT_ACCURACY = 10_000  # GK accuracy: rank error <= n / accuracy
APPROX_PCT_SLACK = 4  # absolute slack on top of the rank bound (ties/edges)
TOPK_MAX_TRACKED = 8_192  # frequent-items map size per sketch
TOPK_ESTIMATE_K = 512  # items returned by the merged estimate


def hll_distinct_audit(
    df: DataFrame,
    group_col: str,
    key_col: str,
    pk_col: str,
    num_slices: int = 32,
    rel_err: float = HLL_REL_ERR,
) -> DataFrame:
    """Distinct-count audit: per-slice HLL sketches (map-side, one per
    token-range slice as a stand-in for per-partition partial aggs) are
    union-merged per group and the estimate is checked against the exact
    ``countDistinct`` within ``rel_err``.

    Returns (group_col, n_exact, hll_ok). At scale the exact branch is the
    expensive one (shuffles the key); production runs sketch-only and this
    audit runs on samples — the shape under test is the slice→merge
    pipeline, which never moves rows, only sketch bytes.
    """
    sliced = with_slice(df, pk_col, num_slices)
    per_slice = sliced.groupBy(group_col, "slice_id").agg(
        F.hll_sketch_agg(key_col, F.lit(HLL_LG_K)).alias("sk")
    )
    merged = per_slice.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_est")
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(key_col).cast("bigint").alias("n_exact")
    )
    return exact.join(merged, group_col).select(
        group_col,
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= F.greatest(F.lit(1), F.ceil(F.lit(rel_err) * F.col("n_exact")))
        ).alias("hll_ok"),
    )


def quantile_sketch_audit(
    df: DataFrame,
    group_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = APPROX_PCT_ACCURACY,
) -> DataFrame:
    """Quantile-sketch audit: ``percentile_approx`` (single-pass, mergeable
    GK sketch) must return, per group and quantile q, a value whose rank
    interval [#rows < v + 1, #rows <= v] touches q*n ± (n/accuracy +
    slack) — the sketch's published rank-error contract.

    Returns (group_col, n, p<q>_ok ...). One agg for the sketch, one
    broadcast-join + agg for the rank check; the exact two-phase
    distributed percentile (operators/rank.py) stays the verbatim-value
    path — this is the cheap single-pass alternative with its error bound
    under CI.
    """
    apx = df.groupBy(group_col).agg(
        F.percentile_approx(val_col, list(qs), accuracy).alias("apx"),
        F.count(val_col).cast("bigint").alias("n"),
    )
    j = df.join(F.broadcast(apx), group_col)
    aggs = []
    for i in range(len(qs)):
        aggs.append(
            F.sum((F.col(val_col) < F.col("apx")[i]).cast("bigint")).alias(f"rlo_{i}")
        )
        aggs.append(
            F.sum((F.col(val_col) <= F.col("apx")[i]).cast("bigint")).alias(f"rhi_{i}")
        )
    ranked = j.groupBy(group_col, "n").agg(*aggs)
    out = [F.col(group_col), F.col("n")]
    for i, q in enumerate(qs):
        err = F.col("n") / accuracy + F.lit(APPROX_PCT_SLACK)
        target = F.lit(q) * F.col("n")
        ok = (F.col(f"rhi_{i}") >= target - err) & (
            F.col(f"rlo_{i}") + 1 <= target + err
        )
        out.append(ok.alias(f"p{int(q * 100)}_ok"))
    return ranked.select(*out)


def heavy_hitter_audit(
    df: DataFrame,
    key_col: str,
    pk_col: str,
    threshold_frac: float,
    num_slices: int = 32,
    max_tracked: int = TOPK_MAX_TRACKED,
    estimate_k: int = TOPK_ESTIMATE_K,
) -> DataFrame:
    """Heavy-hitter audit: per-slice DataSketches frequent-items sketches
    (``approx_top_k_accumulate``) are combined and estimated; every key
    whose EXACT count >= threshold_frac * N (a true heavy hitter well above
    the sketch's ~3.5*N/max_tracked error floor) must be found, with the
    estimate within that floor.

    Returns (key_col, n_exact, found_ok, est_ok). This is the pre-join
    hot-key detector: at 100 TB you run the sketch pass alone (bytes-only
    merge) to pick salting candidates; the exact branch exists for the
    audit.
    """
    sliced = with_slice(df, pk_col, num_slices)
    per_slice = sliced.groupBy("slice_id").agg(
        F.expr(f"approx_top_k_accumulate({key_col}, {max_tracked})").alias("sk")
    )
    est = per_slice.agg(
        F.expr(
            f"approx_top_k_estimate(approx_top_k_combine(sk, {max_tracked}), {estimate_k})"
        ).alias("est")
    )
    est_items = est.select(F.explode("est").alias("e")).select(
        F.col("e.item").alias(key_col),
        F.col("e.count").cast("bigint").alias("n_est"),
    )
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_exact") >= F.ceil(F.lit(threshold_frac) * F.col("n_tot")))
    )
    err_floor = F.greatest(
        F.lit(1), F.ceil(F.lit(3.5) * F.col("n_tot") / F.lit(max_tracked))
    )
    return exact.join(est_items, key_col, "left").select(
        key_col,
        "n_exact",
        F.col("n_est").isNotNull().alias("found_ok"),
        (
            F.col("n_est").isNotNull()
            & (F.abs(F.col("n_est") - F.col("n_exact")) <= err_floor)
        ).alias("est_ok"),
    )
