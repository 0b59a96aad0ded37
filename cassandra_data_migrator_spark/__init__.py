"""cassandra_data_migrator_spark — a PySpark-native analytics/migration engine.

Re-implements the capabilities of the reference image (a Docker wrapper around
DataStax Cassandra Data Migrator; see /root/reference/Dockerfile:59 and
entrypoint.sh:230-243) as an idiomatic Spark DataFrame engine:

- token-range parallel table scan / migrate (plans.migrate)
- row-level transform features: constant columns, codecs, extract-json,
  explode-map, writetime/TTL compute (operators.transforms, functions.*)
- filters: CQL where, token-range, percent coverage, writetime window,
  column-value skip (operators.transforms)
- validation diff + autocorrect + counter reconcile (operators.validation)
- guardrail scan (operators.guardrail), job counters (operators.counters)
- slice planner / run tracking / resume (operators.partition, plans.tracking)
- north-star LLM-pipeline extensions: dedup (exact/minhash/simhash/ngram/
  embedding), similarity search, text analysis, event-time windows, multimodal
  column plumbing (operators.dedup/similarity/windows/multimodal)

Everything is DataFrame-first: logical plans are declared with pyspark.sql and
optimized by Catalyst; no RDD hot paths, no driver-side row loops.
"""

__version__ = "0.1.0"

from cassandra_data_migrator_spark.session import configure_session, get_spark

__all__ = ["configure_session", "get_spark", "__version__"]
