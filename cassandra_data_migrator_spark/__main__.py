"""CLI entry point — the engine's analog of the reference's two launchers
(/root/reference/entrypoint.sh:274-286 auto mode, spark-submit-cdm:27-39
manual mode):

    python -m cassandra_data_migrator_spark <job> \
        --origin /root/testdata/sf0.001 --table orders \
        [--target-table-path /tmp/out] [--conf spark.cdm.foo=bar ...] \
        [--sf-target /tmp/t]

Config resolution order mirrors the wrapper: CDM_PROPERTY_* env vars first
(entrypoint.sh:121-178), then explicit --conf overrides. Unknown keys and
unknown jobs abort, as in the reference. Prints a one-line JSON result
(counters / row counts) to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from cassandra_data_migrator_spark.config import MigrationConfig, dispatch_job
from cassandra_data_migrator_spark.plans.migrate import run_job
from cassandra_data_migrator_spark.session import get_spark
from cassandra_data_migrator_spark.sources.parquet import load_table


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cassandra_data_migrator_spark")
    ap.add_argument("job", help="migrate | validate/diffdata | guardrail[check]")
    ap.add_argument("--origin", required=True, help="origin sf_dir (parquet fixtures)")
    ap.add_argument("--table", required=True, help="origin table name")
    ap.add_argument("--target", help="target sf_dir for validate (defaults to origin)")
    ap.add_argument("--target-table", help="target table name (defaults to --table)")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="spark.cdm.* property override (repeatable)",
    )
    args = ap.parse_args(argv)

    overrides = {}
    for item in args.conf:
        k, sep, v = item.partition("=")
        if not sep:
            ap.error(f"--conf expects KEY=VALUE, got {item!r}")
        overrides[k] = v

    job = dispatch_job(args.job)  # fail fast on unknown job, like entrypoint.sh:240-242
    # the wrapper's pre-job environment hooks, same order (entrypoint.sh
    # main): logging property injection, then SSL truststore imports
    from cassandra_data_migrator_spark.logging_bridge import configure_logging_from_env
    from cassandra_data_migrator_spark.sources.ssl import import_ssl_certificates

    configure_logging_from_env()
    import_ssl_certificates()
    cfg = MigrationConfig.from_env().with_overrides(**overrides)

    # reuse an active session if the caller (tests, notebooks) owns one —
    # only stop sessions this process created
    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(f"cdm-spark-{job}")
    try:
        origin = load_table(spark, args.origin, args.table)
        target = None
        if job == "validate":
            target = load_table(
                spark, args.target or args.origin, args.target_table or args.table
            )
        result = run_job(spark, job, origin, cfg, target=target)
        summary = {"job": result.job, "rows": result.output.count()}
        if result.counters:
            summary["counters"] = result.counters
        print(json.dumps(summary))
        return 0
    finally:
        if existing is None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
