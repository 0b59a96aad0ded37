"""Rate limiting (SURVEY.md §4.1 perfops; reference pins the knobs via
/root/reference/Dockerfile:60-61 — ``spark.cdm.perfops.ratelimit.origin`` /
``.target``, CDM's per-JVM Guava RateLimiter [upstream@6.0.1]).

Spark-native shape: a distributed token-bucket pacer. There is no global
limiter in a shared-nothing job, so the aggregate budget is divided evenly
across tasks (exactly what CDM's per-JVM limiter becomes under
``--master local[*]``: one JVM, one budget; on a many-executor cluster each
executor JVM gets its share). Each task paces its Arrow batches so its
cumulative row count never runs ahead of ``rows_per_sec / num_tasks``.

The pacer is a ``mapInPandas`` identity — Python touches the stream only to
sleep, batch-at-a-time (never row-at-a-time), and the Arrow transfer cost is
irrelevant by construction: the operator exists to cap throughput. It is OFF
unless ``spark.cdm.perfops.ratelimit.enabled`` is set (the engine's default
is unthrottled — the reference's 20k/40k defaults exist because CDM must
protect a live Cassandra origin; a parquet scan needs no such protection).

For a live Cassandra sink the connector-native limiter is the better tool:
``connector_write_options_from_config`` (sources/cassandra.py) passes
``spark.cassandra.output.throughputMBPerSec`` through. For file sinks and
for rows-based semantics parity with CDM, this operator is the real thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def throttled(
    df: DataFrame, rows_per_sec: int, num_tasks: int | None = None
) -> DataFrame:
    """Identity on the data; paces each task at rows_per_sec/num_tasks.

    ``num_tasks`` defaults to the session's default parallelism (the number
    of concurrently-running tasks in local mode; on a cluster pass the real
    executor-slot count). ``rows_per_sec <= 0`` means unlimited.
    """
    if rows_per_sec <= 0:
        return df
    spark = df.sparkSession
    tasks = num_tasks or spark.sparkContext.defaultParallelism or 1
    share = max(rows_per_sec / tasks, 1e-9)
    schema = df.schema

    # closure, not module-level: worker pickles must be self-contained
    # (workers don't have the package on sys.path)
    def _pace(batches):
        import time

        start = time.monotonic()
        sent = 0
        for pdf in batches:
            sent += len(pdf)
            # sleep until the cumulative allowance covers this batch, THEN
            # release it downstream — the sink never runs ahead of the budget
            delay = sent / share - (time.monotonic() - start)
            if delay > 0:
                time.sleep(delay)
            yield pdf

    return df.mapInPandas(_pace, schema)
