"""Approximate/sketch operators — the documented 100 TB substitutions for
exact ops in the declared surface (SCALE.md, VERDICT r1 notes):

- `approx_count_distinct` (HLL++) replaces `count_distinct` in
  profile_table-style audits where a 2% answer at 1% of the shuffle is the
  right trade;
- `approx_percentile` (KLL-style) replaces exact `percentile` in the
  quantiles key once per-group sorts stop fitting;
- a Bloom filter built over dim keys pre-prunes a fact scan before the join
  (runtime row-level filtering by hand) — no false negatives, bounded FPR.

These stay pytest-side (approximate answers can't hash-match a DuckDB
oracle); the bounds asserted here are the contract."""

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources.parquet import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.count_distinct("l_partkey").alias("d")).collect()[0]["d"]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("d")
    ).collect()[0]["d"]
    assert abs(approx - exact) / exact < 0.06  # 3σ of rsd=0.02


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.select(
        F.percentile("l_extendedprice", 0.5).alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    # with accuracy=10000 the rank error is ≤ n/10000; values are dense so
    # the value error stays well under 1%
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Spark's runtime row-level filtering: a selective dim side injects a
    bloom_filter_agg → might_contain pre-filter on the fact scan BEFORE the
    shuffle join (spark.sql.optimizer.runtime.bloomFilter, on by default).
    At 100 TB this prunes the fact shuffle down to ~the matching rows. The
    default size thresholds (10 MB creation / 10 GB application) are tuned
    for real clusters, so this pins the mechanism by relaxing them at test
    scale — and pins that the pruned join is still exact."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        dim = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 10)
        j = li.join(dim, li.l_partkey == dim.p_partkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        pruned_cnt = j.count()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    # same join without the bloom injection must agree exactly
    li2 = load_table(spark, sf_dir, "lineitem")
    dim2 = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    assert li2.join(dim2, li2.l_partkey == dim2.p_partkey).count() == pruned_cnt
    assert pruned_cnt > 0


def test_multi_probe_bits_generalize(spark, sf_dir):
    """Round-5 review: probe_bits=3 must actually probe 3-bit neighbors
    (previously capped silently at 2): candidate coverage at 3 bits is a
    superset of 2 bits, and both are supersets of single-probe."""
    from cassandra_data_migrator_spark.operators.similarity import lsh_topk_banded
    from cassandra_data_migrator_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 7)
    res = {}
    for pb in (0, 2, 3):
        rows = lsh_topk_banded(emb, qs, k=10, num_bands=8, probe_bits=pb).select(
            "query_id", "vec_id"
        ).collect()
        res[pb] = {(r.query_id, r.vec_id) for r in rows}
    # more probes -> at least as many (query, neighbor) results recovered
    assert len(res[2]) >= len(res[0])
    assert len(res[3]) >= len(res[2])
