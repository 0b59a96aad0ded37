"""Graph analytics over candidate-pair edge lists (dedup observability).

Everything here operates on the SPARSE pair list the near-dup generators
emit — the corpus never enters. See queries.q_graph_degree /
q_graph_triangles for the degree/triangle shapes; this module holds the
iterative ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_ITERS = 5
PAGERANK_D = 0.85  # damping; the base term uses the literal 0.15
PAGERANK_CKPT_EVERY = 2  # r12 (guide §2.4): each eager localCheckpoint is a
# full materialization job; per-iteration cuts measured 2.46 s vs 1.94 s at
# every-2 (sf0.1 isolated 3-run medians). Lineage still stays bounded (at
# most 2 iterations of join+agg stack before a cut), so high iteration
# counts cannot blow up planning — the reason the cut exists at all.


def pagerank_pairs(
    pairs: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_D,
) -> DataFrame:
    """PageRank over an undirected pair list (id_a, id_b) — fixed power
    iterations as a driver loop of join+agg rounds; per-round
    localCheckpoint cuts lineage; the only driver state is the node count.

    Exact and order-free at any parallelism: each contribution is rounded
    to 10dp and summed as DECIMAL(28,10), so every iteration's vector is a
    pure function of the edge list (this is what lets the iterative result
    sit under the driver's value-hash check — queries.q_pagerank_dup_graph
    unrolls the identical arithmetic as chained ANSI CTEs).

    Returns (doc_id, pr_r) with pr_r rounded to 6dp (signed-zero-safe)."""
    spark = pairs.sparkSession
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .withColumnRenamed("src", "doc_id")
        .localCheckpoint()
    )
    n = deg.count()  # node count of the sparse graph — one driver scalar
    if n == 0:
        return spark.createDataFrame([], "doc_id bigint, pr_r double")
    base = 0.15 / n
    pr = deg.select("doc_id", "deg", F.lit(1.0 / n).alias("pr"))
    for it in range(iters):
        contrib = edges.join(pr, edges.src == pr.doc_id).select(
            F.col("dst"),
            F.round(F.col("pr") * F.lit(damping) / F.col("deg"), 10)
            .cast("decimal(28,10)")
            .alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("sc"))
        pr = deg.join(sums, deg.doc_id == sums.dst, "left").select(
            deg.doc_id,
            deg.deg,
            (
                F.lit(base) + F.coalesce(F.col("sc").cast("double"), F.lit(0.0))
            ).alias("pr"),
        )
        if (it + 1) % PAGERANK_CKPT_EVERY == 0:
            pr = pr.localCheckpoint()
    return pr.select("doc_id", (F.round(F.col("pr"), 6) + F.lit(0.0)).alias("pr_r"))
