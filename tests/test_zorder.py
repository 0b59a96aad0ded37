"""Z-order layout audit invariants (queries.q_zorder_prune_audit).

The oracle pins exact values against DuckDB; these tests pin the two
properties the oracle cannot express as a hash match: the Morton formula
itself (vs a pure-python bit interleave) and the layout claim (the z
layout never touches MORE buckets than the linear layout for the pinned
time-band box, and actually prunes on the fixtures).
"""

from pyspark.sql import functions as F

from cassandra_data_migrator_spark import queries as q


def _py_morton(x: int, y: int, bits: int) -> int:
    v = 0
    for i in range(bits):
        v |= ((x >> i) & 1) << (2 * i + 1)
        v |= ((y >> i) & 1) << (2 * i)
    return v


def test_zorder_sql_matches_python_interleave(spark):
    """The portable arithmetic expansion must equal the bit-twiddled
    reference for every corner and a diagonal sweep of the 8-bit grid."""
    pts = [(0, 0), (255, 255), (255, 0), (0, 255), (1, 2), (170, 85)] + [
        (i, 255 - i) for i in range(0, 256, 17)
    ]
    df = spark.createDataFrame(pts, "xs INT, ys INT")
    got = df.select(
        "xs", "ys", F.expr(q._zorder_sql("xs", "ys", "div")).alias("zv")
    ).collect()
    for r in got:
        assert r["zv"] == _py_morton(r["xs"], r["ys"], q.ZORDER_BITS), (r["xs"], r["ys"])


def test_zorder_prunes_on_fixture(spark, sf_dir):
    row = q.q_zorder_prune_audit(spark, sf_dir).collect()[0]
    assert row["z_buckets_touched"] <= row["lin_buckets_touched"]
    # the box covers 1/4 of the y range: the 4x4 z grid confines it to
    # one y-stripe (4 buckets) while the x-linear layout scatters it
    assert row["z_buckets_touched"] <= q.ZORDER_BUCKETS // 2
    assert row["prune_gain_r4"] >= 2.0
