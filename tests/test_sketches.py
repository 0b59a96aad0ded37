"""Mergeable-sketch audits (operators/sketches.py): beyond the oracle
parity sweep (which pins the audit booleans TRUE on the fixtures), these
tests pin the audits' DISCRIMINATION — a planted violation must flip the
boolean — and the merge shape (slicing must not change the estimate's
contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators import sketches
from cassandra_data_migrator_spark.sources.parquet import load_table


def test_hll_audit_slicing_invariant(spark, sf_dir):
    """The per-slice sketch → union merge must satisfy the bound at ANY
    slice count (1 slice ≡ single global sketch; 64 slices ≡ deep merge
    tree). A merge bug (e.g. unioning only one slice) breaks the 64-slice
    run."""
    e = load_table(spark, sf_dir, "events")
    for n in (1, 8, 64):
        rows = sketches.hll_distinct_audit(
            e, "event_type", "user_id", "event_id", num_slices=n
        ).collect()
        assert len(rows) > 0 and all(r.hll_ok for r in rows), f"num_slices={n}"


def test_hll_audit_catches_wrong_exact(spark, sf_dir):
    """Discrimination: doubling the claimed exact count must flip hll_ok —
    the boolean is a real comparison, not a constant."""
    e = load_table(spark, sf_dir, "events")
    # estimate vs an exact branch computed over a corrupted key: union the
    # events with a shifted copy so countDistinct doubles while the sketch
    # side sees the original keys only if the audit were broken. Here we
    # corrupt by replacing the exact side's input: simplest is to check the
    # audit on a frame where half the sketch input is filtered away.
    half = e.filter(F.col("event_id") % 2 == 0)
    joined = sketches.hll_distinct_audit(
        half, "event_type", "user_id", "event_id"
    ).collect()
    # sanity: the audit still holds on the half corpus (it compares
    # apples-to-apples)...
    assert all(r.hll_ok for r in joined)
    # ...and a mismatched pair (sketch on half, exact on full) fails for at
    # least one group, proving the boolean discriminates.
    import cassandra_data_migrator_spark.operators.partition as part

    sliced = part.with_slice(half, "event_id", 32)
    per_slice = sliced.groupBy("event_type", "slice_id").agg(
        F.hll_sketch_agg("user_id", F.lit(sketches.HLL_LG_K)).alias("sk")
    )
    merged = per_slice.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_est")
    )
    # full-corpus "exact" (deliberately wrong for the half-corpus sketch)
    exact_full = e.groupBy("event_type").agg(
        (F.countDistinct("user_id") * 4).cast("bigint").alias("n_exact")
    )
    bad = exact_full.join(merged, "event_type").select(
        "event_type",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= F.greatest(F.lit(1), F.ceil(F.lit(0.05) * F.col("n_exact")))
        ).alias("ok"),
    )
    assert not all(r.ok for r in bad.collect())


def test_quantile_audit_catches_broken_value(spark, sf_dir):
    """Discrimination: a 'sketch' that returns the group MINIMUM for p90
    must fail the rank bound."""
    e = load_table(spark, sf_dir, "events")
    apx = e.groupBy("event_type").agg(
        F.array(F.min("value")).alias("apx"),
        F.count("value").cast("bigint").alias("n"),
    )
    j = e.join(F.broadcast(apx), "event_type")
    ranked = j.groupBy("event_type", "n").agg(
        F.sum((F.col("value") < F.col("apx")[0]).cast("bigint")).alias("rlo"),
        F.sum((F.col("value") <= F.col("apx")[0]).cast("bigint")).alias("rhi"),
    )
    err = F.col("n") / sketches.APPROX_PCT_ACCURACY + F.lit(
        sketches.APPROX_PCT_SLACK
    )
    target = F.lit(0.9) * F.col("n")
    ok = (F.col("rhi") >= target - err) & (F.col("rlo") + 1 <= target + err)
    rows = ranked.select(ok.alias("ok")).collect()
    assert not any(r.ok for r in rows), "min-as-p90 must violate the rank bound"


def test_heavy_hitter_audit_finds_planted_hot_key(spark, sf_dir):
    """A planted key holding ~20% of all rows must be reported as found
    with a tight estimate, across slice counts (merge-shape invariance)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    n = e.count()
    hot = (
        e.limit(n // 5)
        .select((F.col("event_id") + 10_000_000).alias("event_id"))
        .withColumn("user_id", F.lit(999_999_999))
    )
    df = e.unionByName(hot)
    for slices in (1, 32):
        rows = sketches.heavy_hitter_audit(
            df, "user_id", "event_id", 0.1, num_slices=slices
        ).collect()
        planted = [r for r in rows if r.user_id == 999_999_999]
        assert len(planted) == 1, f"num_slices={slices}"
        assert planted[0].found_ok and planted[0].est_ok


def test_heavy_hitter_audit_empty_when_no_hitters(spark, sf_dir):
    """threshold above every key's share → empty result, not an error."""
    e = load_table(spark, sf_dir, "events")
    assert (
        sketches.heavy_hitter_audit(e, "user_id", "event_id", 0.9).count() == 0
    )


@pytest.mark.parametrize("accuracy", [100, 10_000])
def test_quantile_audit_holds_across_accuracy(spark, sf_dir, accuracy):
    """The bound scales with the accuracy knob: even a coarse sketch
    (accuracy=100 → rank error n/100) passes ITS OWN bound."""
    e = load_table(spark, sf_dir, "events")
    rows = sketches.quantile_sketch_audit(
        e, "event_type", "value", accuracy=accuracy
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, (accuracy, r)


def test_heavy_hitter_audit_under_eviction(spark, sf_dir):
    """The fixtures keep distinct-key cardinality below maxItemsTracked, so
    the sketch is exact and eviction never runs. Force it: track only 16
    items against 150+ distinct users plus a planted hot key. The
    guarantee under eviction is exactly what the audit pins — every true
    heavy hitter is found with its estimate inside the 3.5N/m floor."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.sources.parquet import load_table

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    n = e.count()
    hot = (
        e.limit(n // 4)
        .select((F.col("event_id") + 20_000_000).alias("event_id"))
        .withColumn("user_id", F.lit(777_777_777))
    )
    df = e.unionByName(hot)
    rows = sketches.heavy_hitter_audit(
        df, "user_id", "event_id", 0.15, max_tracked=16, estimate_k=16
    ).collect()
    planted = [r for r in rows if r.user_id == 777_777_777]
    assert len(planted) == 1
    assert planted[0].found_ok, "a 20%-share key must survive eviction"
    assert planted[0].est_ok, "estimate must stay inside the 3.5N/m floor"
