"""Job composition — the engine's lifecycle (SURVEY.md §3 'Our engine's
lifecycle'): MigrationConfig → declarative DataFrame pipeline → Catalyst.

Three jobs, mirroring the only three driver classes the reference can launch
(/root/reference/entrypoint.sh:230-243, spark-submit-cdm:11-36):

- migrate   (com.datastax.cdm.job.Migrate analog)
- validate  (com.datastax.cdm.job.DiffData analog)
- guardrail (com.datastax.cdm.job.GuardrailCheck analog)

The feature pipeline applies in CDM's effective order: source filters first
(where/token/percent — pushed into the scan), then row transforms (constants,
extract-json, explode-map, writetime), then writetime-window / column-skip
filters, then sink. There is no bespoke IR: the logical plan IS Catalyst's.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.config import MigrationConfig, dispatch_job
from cassandra_data_migrator_spark.functions.json_ops import extract_json, json_to_map
from cassandra_data_migrator_spark.functions.writetime import (
    max_ttl,
    max_writetime,
    ttl_columns,
    writetime_columns,
)
from cassandra_data_migrator_spark.operators import transforms, validation
from cassandra_data_migrator_spark.operators.counters import observed
from cassandra_data_migrator_spark.operators.guardrail import colsize_guardrail


@dataclass
class JobResult:
    job: str
    output: DataFrame
    counters: dict[str, int] | None = None


def build_feature_pipeline(df: DataFrame, cfg: MigrationConfig) -> DataFrame:
    """Config-driven transform chain (pure Column expressions end to end)."""
    # 1. source-side filters (Catalyst pushes these into the scan)
    where = cfg.get("spark.cdm.filter.cassandra.whereCondition")
    if where:
        df = transforms.where_filter(df, where)

    pk = cfg.pk_columns()
    tmin = cfg.get("spark.cdm.filter.cassandra.partition.min")
    tmax = cfg.get("spark.cdm.filter.cassandra.partition.max")
    if pk and (tmin != -2147483648 or tmax != 2147483647):
        df = transforms.token_range_filter(df, pk[0], tmin, tmax)

    pct = cfg.get("spark.cdm.filter.java.token.percent")
    if pk and pct < 100:
        df = transforms.percent_coverage_filter(df, pk[0], pct)

    col_name = cfg.get("spark.cdm.filter.java.column.name")
    col_value = cfg.get("spark.cdm.filter.java.column.value")
    if col_name and col_value:
        df = transforms.column_value_skip_filter(df, col_name, col_value)

    # 2. writetime compute + window filter. A custom (constant) writetime
    # needs NO tracked per-cell columns — CDM's custom.writetime is a fixed
    # override, so gate on (tracked cols OR the constant); previously a
    # constant-writetime migration over an input with no tracked cells
    # silently emitted no __writetime (ADVICE r10).
    wt_cols = writetime_columns(df)
    custom = cfg.get("spark.cdm.transform.custom.writetime") or None
    if wt_cols or custom is not None:
        inc = cfg.get("spark.cdm.transform.custom.writetime.incrementBy")
        df = df.withColumn("__writetime", max_writetime(wt_cols, custom, inc))
        wmin = cfg.get("spark.cdm.filter.java.writetime.min") or None
        wmax = cfg.get("spark.cdm.filter.java.writetime.max") or None
        df = transforms.writetime_window_filter(df, F.col("__writetime"), wmin, wmax)

    # 2b. TTL compute: max over tracked per-cell TTL columns (or the custom
    # constant) — CDM's WritetimeTTL.getLargestTTL [upstream@6.0.1], the
    # other half of the per-row USING TIMESTAMP ... AND TTL payload the
    # cassandra sink forwards as a column-valued writer option. Without
    # this the sink's __ttl branch was unreachable (r09 verdict #6).
    ttl_cols = ttl_columns(df)
    custom_ttl = cfg.get("spark.cdm.transform.custom.ttl") or None
    if ttl_cols or custom_ttl is not None:
        df = df.withColumn("__ttl", max_ttl(ttl_cols, custom_ttl))

    # 3. row transforms
    ej_col = cfg.get("spark.cdm.feature.extractJson.originColumn")
    if ej_col:
        prop = cfg.get("spark.cdm.feature.extractJson.propertyName")
        target = cfg.get("spark.cdm.feature.extractJson.targetColumn") or prop
        df = df.withColumn(target, extract_json(ej_col, prop))

    em_col = cfg.get("spark.cdm.feature.explodeMap.origin.name")
    if em_col:
        key_name = cfg.get("spark.cdm.feature.explodeMap.target.name.key")
        val_name = cfg.get("spark.cdm.feature.explodeMap.target.name.value")
        src = F.col(em_col)
        if dict(df.dtypes)[em_col] == "string":
            src = json_to_map(em_col)
        df = df.select("*", F.explode(src).alias(key_name, val_name)).drop(em_col)

    consts = cfg.constant_columns()
    if consts:
        df = transforms.constant_columns(
            df, {n: (v, t) for n, (v, t) in consts.items()}
        )

    # 4. projection / rename to target schema (column pruning point)
    mapping = cfg.column_mapping()
    if mapping:
        passthrough = [c for c in df.columns if c not in mapping and not c.startswith("__")]
        df = df.select(
            *[F.col(c) for c in passthrough],
            *[F.col(o).alias(t) for o, t in mapping.items()],
        )
    return df


def run_migrate(spark: SparkSession, origin: DataFrame, cfg: MigrationConfig) -> JobResult:
    """Migrate: origin → feature pipeline → target sink (parquet world).

    Counters ride along via df.observe (no second scan, SURVEY.md §2 #24).
    """
    piped = build_feature_pipeline(origin, cfg)
    if cfg.get("spark.cdm.perfops.ratelimit.enabled"):
        from cassandra_data_migrator_spark.operators.ratelimit import throttled

        # CDM semantics: the origin limit paces the read, the target limit
        # paces the write. In one linear pipeline the tighter budget governs
        # end-to-end, so apply min(origin, target) once — one pacer, no
        # second Arrow round-trip.
        rate = min(
            cfg.get("spark.cdm.perfops.ratelimit.origin"),
            cfg.get("spark.cdm.perfops.ratelimit.target"),
        )
        piped = throttled(piped, rate)
    out_path = cfg.get("spark.cdm.connect.target.path")
    obs_df, obs = observed(piped, F.lit(False))
    if cfg.get("spark.cdm.connect.target.format") == "cassandra":
        # Live-cluster sink: perfops knobs (batch size, target throughput)
        # travel from the config into the connector writer options, and the
        # computed per-row writetime/TTL columns ride as writer column
        # options (sources/cassandra.py documents the mapping).
        from cassandra_data_migrator_spark.sources.cassandra import (
            migrate_write_request,
            write_table,
        )

        wt_col = "__writetime" if "__writetime" in obs_df.columns else None
        ttl_col = "__ttl" if "__ttl" in obs_df.columns else None
        ks, tbl, opts = migrate_write_request(cfg, wt_col, ttl_col)
        write_table(obs_df, ks, tbl, options=opts)
        counters = {k: int(v) for k, v in obs.get.items()}
        return JobResult("migrate", piped, counters)
    if out_path:
        obs_df.write.mode("overwrite").parquet(out_path)
        counters = {k: int(v) for k, v in obs.get.items()}
        return JobResult("migrate", spark.read.parquet(out_path), counters)
    return JobResult("migrate", piped)


def run_validate(
    spark: SparkSession, origin: DataFrame, target: DataFrame, cfg: MigrationConfig
) -> JobResult:
    """DiffData: transformed origin vs target, row compare + optional
    autocorrect payloads. ``spark.cdm.validate.tier`` selects the cost
    tier a 100 TB validation actually climbs (SCALE.md 'Tiered
    validation'):

    - ``full``      — the CDM-semantics complete diff (default);
    - ``sampled``   — the mod-N deterministic PK sample restricts BOTH
      sides before the join (``sampleMod``/``sampleResidue``; hash-based,
      so any PK type samples uniformly), co-partition shuffle moves 1/N;
    - ``prefilter`` — the bloom tier: definitely-missing keys only, zero
      probe-side shuffle (operators/bloom.prefilter_missing).
    """
    piped = build_feature_pipeline(origin, cfg)
    pk = cfg.pk_columns()
    if not pk:
        raise ValueError(
            "validate requires spark.cdm.schema.pk (comma-separated PK columns)"
        )
    tier = cfg.get("spark.cdm.validate.tier")
    if tier not in ("full", "sampled", "prefilter"):
        raise ValueError(
            f"spark.cdm.validate.tier must be full|sampled|prefilter, got {tier!r}"
        )
    if tier == "prefilter":
        from cassandra_data_migrator_spark.operators.bloom import prefilter_missing

        return JobResult("validate", prefilter_missing(piped, target, pk))
    if tier == "sampled":
        mod = cfg.get("spark.cdm.validate.sampleMod")
        residue = cfg.get("spark.cdm.validate.sampleResidue")
        keep = F.pmod(F.xxhash64(*[F.col(c) for c in pk]), F.lit(mod)) == residue
        piped = piped.filter(keep)
        target = target.filter(keep)
    compare = [c for c in piped.columns if c not in pk and not c.startswith("__")]
    report = validation.diff(
        piped, target, pk, compare,
        null_safe_pk=cfg.get("spark.cdm.validate.nullSafePk"),
    )
    return JobResult("validate", report)


def run_guardrail(spark: SparkSession, origin: DataFrame, cfg: MigrationConfig) -> JobResult:
    kb = cfg.get("spark.cdm.feature.guardrail.colSizeInKB")
    pk = cfg.pk_columns()
    checked = [c for c, t in origin.dtypes if t in ("string", "binary") and c not in pk]
    return JobResult("guardrail", colsize_guardrail(origin, pk, checked, kb * 1024))


def run_migrate_tracked(
    spark: SparkSession,
    origin: DataFrame,
    cfg: MigrationConfig,
    tracker,
    previous_run_id: str | None = None,
) -> tuple[JobResult, str]:
    """Migrate with run tracking (#6): restrict the scan to the previous
    run's unfinished slices (resume), mark slices passed on success. The
    failure unit stays the token-range slice, as in CDM."""
    from cassandra_data_migrator_spark.operators.partition import restrict_to_slices
    from cassandra_data_migrator_spark.plans.tracking import STATUS_PASSED

    num_slices = cfg.get("spark.cdm.perfops.numParts")
    pk = cfg.pk_columns()
    if not pk:
        raise ValueError("tracked migrate requires spark.cdm.schema.pk")

    if previous_run_id:
        pending = tracker.pending_slices(previous_run_id)
        run_id = previous_run_id
        scoped = restrict_to_slices(origin, pk[0], num_slices, pending).drop(
            "token", "slice_id"
        )
        # Resume must MERGE into the target, not overwrite it: a plain
        # run_migrate would mode('overwrite') the whole table and destroy the
        # output of every previously-passed slice. Pending-slice rows upsert
        # by PK; everything already migrated survives.
        import os

        out_path = cfg.get("spark.cdm.connect.target.path")
        piped = build_feature_pipeline(scoped, cfg)
        if out_path and os.path.exists(out_path):
            from cassandra_data_migrator_spark.plans.upsert import upsert_parquet

            # read_cnt rides on df.observe over the merge write (same as
            # run_migrate) — no separate count() pass over the pending-slice
            # scan; the observation fires when the staging write materializes.
            obs_piped, obs = observed(piped, F.lit(False))
            merged = upsert_parquet(spark, obs_piped, out_path, pk)
            counters = {k: int(v) for k, v in obs.get.items()}
            result = JobResult("migrate", merged, counters)
        else:
            result = run_migrate(spark, scoped, cfg)
    else:
        pending = list(range(num_slices))
        run_id = tracker.start_run("migrate", num_slices)
        scoped = origin
        result = run_migrate(spark, scoped, cfg)
    tracker.record_slices(run_id, pending, STATUS_PASSED)
    return result, run_id


def run_job(
    spark: SparkSession,
    job_name: str,
    origin: DataFrame,
    cfg: MigrationConfig,
    target: DataFrame | None = None,
) -> JobResult:
    job = dispatch_job(job_name)
    if job == "migrate":
        return run_migrate(spark, origin, cfg)
    if job == "validate":
        if target is None:
            raise ValueError("validate requires a target DataFrame")
        return run_validate(spark, origin, target, cfg)
    return run_guardrail(spark, origin, cfg)
