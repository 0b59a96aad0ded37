"""AQE skew-join handling (SCALE.md: 'skewed keys → salting or AQE skew-join').

Builds a pathologically skewed fact (90% of rows on one key) joined to a
uniform dim with broadcast disabled, and pins that (a) AQE is actually on in
the session and (b) the skewed sort-merge join completes and is correct.
On a multi-executor cluster the same plan triggers OptimizeSkewedJoin
(skew=true in the final plan); in local mode all shuffle blocks are local so
Spark may not mark it, which is why the assertion here is conf + correctness,
with the salted-agg operator (operators/skew.py) covering the manual path."""

from pyspark.sql import functions as F


def test_aqe_enabled_and_skewed_join_correct(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true") == "true"

    n = 200_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = fact.join(dim, "k")
        got = j.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        ).collect()[0]
        assert got["n"] == n
        # every fact row joins exactly one dim row: checksum pins correctness
        expected_s = sum(
            i + 2 * (7 if i % 10 != 0 else i % 100) for i in range(n)
        )
        assert got["s"] == expected_s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aqe_actually_splits_the_skewed_partition(spark):
    """Round-6 upgrade of the caveat above: with the skew thresholds scaled
    to fixture size (they default to 256 MB — cluster scale), local mode
    DOES run OptimizeSkewedJoin, and the final adaptive plan must show the
    split (`SortMergeJoin(skew=true)` + a skewed AQEShuffleRead). This
    demonstrates the runtime re-plan the 100 TB story leans on, not just
    that the conf is set."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = fact.join(dim, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        got = j.collect()[0]["s"]
        assert got == sum(
            i + 2 * (7 if i % 10 != 0 else i % 100) for i in range(n)
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"OptimizeSkewedJoin did not fire:\n{plan[:1500]}"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
