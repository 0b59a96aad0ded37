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
