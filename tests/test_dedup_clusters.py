"""Connected-components dedup clustering + diff property tests."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.dedup import dedup_clusters, dedup_fuzzy
from cassandra_data_migrator_spark.operators.validation import derived_target, diff
from cassandra_data_migrator_spark.sources.parquet import load_table


def test_cluster_assignment_chains_and_singletons(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id BIGINT")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a BIGINT, id_b BIGINT"
    )
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(ids, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_cluster_long_chain_converges(spark):
    n = 20
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id BIGINT")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a BIGINT, id_b BIGINT"
    )
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(ids, pairs).collect()}
    assert set(out.values()) == {0}


def test_cluster_from_fuzzy_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_fuzzy(docs, threshold=0.2).select("id_a", "id_b")
    clusters = dedup_clusters(docs, pairs)
    assert clusters.count() == docs.count()
    # every cluster_id is a member of its own cluster (min-id witness exists)
    reps = clusters.select(F.col("cluster_id").alias("doc_id")).distinct()
    missing = reps.join(clusters.select("doc_id"), "doc_id", "left_anti")
    assert missing.count() == 0


@given(
    missing_mod=st.sampled_from([7, 11, 13]),
    mutate_mod=st.sampled_from([5, 17, 19]),
)
@settings(max_examples=6, deadline=None)
def test_diff_detects_exactly_the_perturbation(spark_g, missing_mod, mutate_mod):
    """Property: for any (missing, mutate) perturbation pattern, diff reports
    exactly the perturbed PKs with the right statuses."""
    spark = spark_g
    origin = spark.range(0, 300).select(
        F.col("id").alias("pk"), (F.col("id") * 3 % 50).cast("string").alias("v")
    )
    target = origin.filter(F.col("pk") % missing_mod != 0).withColumn(
        "v",
        F.when(F.col("pk") % mutate_mod == 0, F.lit("MUT")).otherwise(F.col("v")),
    )
    report = diff(origin, target, ["pk"], ["v"])
    got_missing = {r.pk for r in report.filter("status = 'missing'").collect()}
    got_mismatch = {r.pk for r in report.filter("status = 'mismatch'").collect()}
    exp_missing = {i for i in range(300) if i % missing_mod == 0}
    exp_mismatch = {
        i for i in range(300) if i % mutate_mod == 0 and i % missing_mod != 0
        and str(i * 3 % 50) != "MUT"
    }
    assert got_missing == exp_missing
    assert got_mismatch == exp_mismatch


# session-scoped fixture alias usable inside hypothesis (no function-scoped
# fixture interaction)
import pytest


@pytest.fixture(scope="session")
def spark_g(spark):
    return spark
