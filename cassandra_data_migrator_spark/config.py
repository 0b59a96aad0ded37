"""Configuration layer — the engine's user-facing API.

The reference has no query language: its entire API is a flat Java-properties
file mutated by env vars (/root/reference/Dockerfile:60-61, entrypoint.sh
88-179). This module reproduces those semantics Pythonically:

- a CLOSED, validated key registry — unknown keys are a hard error, mirroring
  entrypoint.sh:145-149 ("Error: <key> is not found in ..." → exit 1);
- env-var injection: ``CDM_PROPERTY_FOO_BAR`` → key ``foo.bar`` (lowercase,
  ``_``→``.``), mirroring entrypoint.sh:121-135;
- value indirection: a value of ``env:VAR`` resolves to ``$VAR``, mirroring
  entrypoint.sh:137-141;
- job dispatch: migrate | validate/diffdata | guardrail/guardrailcheck,
  unknown job → error, mirroring entrypoint.sh:230-243;
- credentials-file injection: ``CDM_CREDENTIALS_{ORIGIN,TARGET}_JSON`` names
  a JSON file whose username/password become ``spark.cdm.connect.*``
  properties, explicit env vars winning, missing file a hard error,
  mirroring entrypoint.sh:52-86.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

ENV_PREFIX = "CDM_PROPERTY_"

# The closed key registry (the subset of CDM's cdm-detailed.properties surface
# this engine implements; keys are spark.cdm.*-shaped for familiarity).
# value = (type, default)
KNOWN_KEYS: dict[str, tuple[type, Any]] = {
    # connect / io
    "spark.cdm.connect.origin.format": (str, "parquet"),
    "spark.cdm.connect.origin.path": (str, ""),
    "spark.cdm.connect.target.format": (str, "parquet"),
    "spark.cdm.connect.target.path": (str, ""),
    # connect credentials (injected by credentials_from_env or set
    # directly via CDM_PROPERTY_SPARK_CDM_CONNECT_* — entrypoint.sh:52-86)
    "spark.cdm.connect.origin.username": (str, ""),
    "spark.cdm.connect.origin.password": (str, ""),
    "spark.cdm.connect.target.username": (str, ""),
    "spark.cdm.connect.target.password": (str, ""),
    # schema
    "spark.cdm.schema.origin.table": (str, ""),
    "spark.cdm.schema.target.table": (str, ""),
    "spark.cdm.schema.origin.column.names.to.target": (str, ""),  # "a:b,c:d"
    "spark.cdm.schema.pk": (str, ""),  # comma-separated PK columns
    # transform features
    "spark.cdm.feature.constantColumns.names": (str, ""),
    "spark.cdm.feature.constantColumns.values": (str, ""),
    "spark.cdm.feature.constantColumns.types": (str, ""),
    "spark.cdm.feature.extractJson.originColumn": (str, ""),
    "spark.cdm.feature.extractJson.propertyName": (str, ""),
    "spark.cdm.feature.extractJson.targetColumn": (str, ""),
    "spark.cdm.feature.explodeMap.origin.name": (str, ""),
    "spark.cdm.feature.explodeMap.target.name.key": (str, "prop_key"),
    "spark.cdm.feature.explodeMap.target.name.value": (str, "prop_value"),
    "spark.cdm.transform.custom.writetime": (int, 0),
    "spark.cdm.transform.custom.writetime.incrementBy": (int, 0),
    "spark.cdm.transform.custom.ttl": (int, 0),
    # filters
    "spark.cdm.filter.cassandra.whereCondition": (str, ""),
    "spark.cdm.filter.cassandra.partition.min": (int, -2147483648),
    "spark.cdm.filter.cassandra.partition.max": (int, 2147483647),
    "spark.cdm.filter.java.token.percent": (int, 100),
    "spark.cdm.filter.java.writetime.min": (int, 0),
    "spark.cdm.filter.java.writetime.max": (int, 0),
    "spark.cdm.filter.java.column.name": (str, ""),
    "spark.cdm.filter.java.column.value": (str, ""),
    # validation / autocorrect
    "spark.cdm.autocorrect.missing": (bool, False),
    "spark.cdm.autocorrect.mismatch": (bool, False),
    "spark.cdm.autocorrect.missing.counter": (bool, False),
    # PK join null-safety. Default mirrors diff()'s null-safe <=>; set
    # false for the bucketed repeated-validate path (Cassandra PKs can
    # never be null, and null-safe keys defeat bucket co-location — see
    # operators/validation.py diff docstring / tests/test_bucketing.py).
    "spark.cdm.validate.nullSafePk": (bool, True),
    # validation cost tier (SCALE.md 'Tiered validation'): full | sampled
    # (mod-N hash sample of BOTH sides pre-join) | prefilter (bloom
    # definitely-missing scan, zero probe-side shuffle)
    "spark.cdm.validate.tier": (str, "full"),
    "spark.cdm.validate.sampleMod": (int, 10),
    "spark.cdm.validate.sampleResidue": (int, 0),
    # guardrail
    "spark.cdm.feature.guardrail.colSizeInKB": (int, 0),
    # perfops. Rate limits: CDM's limiter is always-on (20k/40k defaults)
    # because it must protect a live Cassandra origin; this engine's default
    # is unthrottled (a parquet scan needs no protection), so the knob takes
    # effect only when ratelimit.enabled is set. When enabled, the origin
    # limit paces the scan and the target limit paces the sink
    # (operators/ratelimit.throttled); against a live Cassandra target the
    # connector-native throughput option is also passed through
    # (sources/cassandra.connector_write_options_from_config).
    "spark.cdm.perfops.numParts": (int, 32),
    "spark.cdm.perfops.batchSize": (int, 5),
    "spark.cdm.perfops.fetchSizeInRows": (int, 1000),
    "spark.cdm.perfops.ratelimit.enabled": (bool, False),
    "spark.cdm.perfops.ratelimit.origin": (int, 20000),
    "spark.cdm.perfops.ratelimit.target": (int, 40000),
    # run tracking
    "spark.cdm.trackRun": (bool, False),
    "spark.cdm.trackRun.previousRunId": (str, ""),
    "spark.cdm.trackRun.runInfo.path": (str, ""),
}

# ---------------------------------------------------------------------------
# Accepted-but-not-implemented tier (r09, verdict #7). REAL knobs from CDM
# 6.0.1's cdm-detailed.properties (the file the reference pins,
# Dockerfile:60-61) that this engine deliberately does not implement — they
# configure live-cluster driver behavior (hosts, TLS, consistency levels,
# paging) or CDM internals this engine replaces with Spark-native
# equivalents (documented per key). A production properties file must port
# WITHOUT edits: these keys are accepted with a warning and recorded in
# ``MigrationConfig.noop_values``; a key in NEITHER registry is still the
# hard error the wrapper raises (entrypoint.sh:145-149). Three tiers total:
#   implemented (KNOWN_KEYS) | accepted-noop (this) | unknown (error).
ACCEPTED_NOOP_KEYS: dict[str, str] = {
    # live-cluster connection endpoints — sources/cassandra.py is an honest
    # interface stub in this sandbox; paths/formats replace host:port
    "spark.cdm.connect.origin.host": "live-cluster endpoint (connector stub)",
    "spark.cdm.connect.origin.port": "live-cluster endpoint (connector stub)",
    "spark.cdm.connect.origin.scb": "Astra secure connect bundle (connector stub)",
    "spark.cdm.connect.target.host": "live-cluster endpoint (connector stub)",
    "spark.cdm.connect.target.port": "live-cluster endpoint (connector stub)",
    "spark.cdm.connect.target.scb": "Astra secure connect bundle (connector stub)",
    # TLS material — driver-level; Spark passes these to the connector
    "spark.cdm.connect.origin.tls.enabled": "driver TLS (connector-level)",
    "spark.cdm.connect.origin.tls.trustStore.path": "driver TLS (connector-level)",
    "spark.cdm.connect.origin.tls.trustStore.password": "driver TLS (connector-level)",
    "spark.cdm.connect.origin.tls.trustStore.type": "driver TLS (connector-level)",
    "spark.cdm.connect.origin.tls.keyStore.path": "driver TLS (connector-level)",
    "spark.cdm.connect.origin.tls.keyStore.password": "driver TLS (connector-level)",
    "spark.cdm.connect.origin.tls.enabledAlgorithms": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.enabled": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.trustStore.path": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.trustStore.password": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.trustStore.type": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.keyStore.path": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.keyStore.password": "driver TLS (connector-level)",
    "spark.cdm.connect.target.tls.enabledAlgorithms": "driver TLS (connector-level)",
    # keyspace.table naming — this engine addresses tables by path/format
    "spark.cdm.schema.origin.keyspaceTable": "addressed by connect.*.path here",
    "spark.cdm.schema.target.keyspaceTable": "addressed by connect.*.path here",
    # per-row TTL/writetime SINK semantics — SURVEY §4.3.1 connector gap;
    # the COMPUTATION is implemented (functions/writetime.py)
    "spark.cdm.schema.origin.column.ttl.automatic": "per-row TTL sink (SURVEY 4.3.1)",
    "spark.cdm.schema.origin.column.ttl.names": "per-row TTL sink (SURVEY 4.3.1)",
    "spark.cdm.schema.origin.column.writetime.automatic": "per-row writetime sink (SURVEY 4.3.1)",
    "spark.cdm.schema.origin.column.writetime.names": "per-row writetime sink (SURVEY 4.3.1)",
    "spark.cdm.schema.ttlwritetime.calc.useCollections": "per-row TTL/writetime sink (SURVEY 4.3.1)",
    # consistency levels / paging / stats cadence — connector & logging level
    "spark.cdm.perfops.consistency.read": "connector input.consistency.level",
    "spark.cdm.perfops.consistency.write": "connector output.consistency.level",
    "spark.cdm.perfops.printStatsAfter": "progress-log cadence (JobCounter logs instead)",
    "spark.cdm.perfops.printStatsPerPart": "progress-log cadence (JobCounter logs instead)",
    "spark.cdm.perfops.errorLimit": "spark.task.maxFailures + slice-manifest retry",
    # codec fine-tuning — codecs are implemented as expressions; these CDM
    # string-format knobs configure its Java codec registry
    "spark.cdm.transform.codecs": "codec conversions are typed expressions here",
    "spark.cdm.transform.codecs.timestamp.string.format": "codec registry knob",
    "spark.cdm.transform.codecs.timestamp.string.zone": "codec registry knob",
    "spark.cdm.transform.missing.key.ts.replace.value": "CDM collection-key repair",
    "spark.cdm.transform.map.remove.null.value": "CDM map-codec repair",
    "spark.cdm.feature.constantColumns.splitRegex": "constant columns split on ',' here",
    # token-range partition files — the slice planner + run tracking replace
    # CDM's file-based range lists (operators/partition.py, plans/tracking.py)
    "spark.cdm.tokenrange.partitionFile.input": "slice planner replaces range files",
    "spark.cdm.tokenrange.partitionFile.output": "slice planner replaces range files",
    "spark.cdm.tokenrange.partitionFile.appendOnDiff": "slice planner replaces range files",
}


class ConfigNoopWarning(UserWarning):
    """A real CDM knob was accepted but has no effect in this engine."""


JOB_ALIASES = {
    "migrate": "migrate",
    "validate": "validate",
    "diffdata": "validate",
    "guardrail": "guardrail",
    "guardrailcheck": "guardrail",
}


class UnknownConfigKeyError(KeyError):
    """Mirror of entrypoint.sh:145-149 — closed config schema."""


class UnknownJobError(ValueError):
    """Mirror of entrypoint.sh:240-242 — unknown job name aborts."""


class ConfigValueError(ValueError):
    """A known key with an out-of-range value."""


class CredentialsError(RuntimeError):
    """Mirror of entrypoint.sh error_exit in set_cluster_role_credentials —
    a configured credentials file that cannot be used is a hard abort."""


# Credentials-file injection (reference entrypoint.sh:52-86,
# set_cluster_role_credentials): env CDM_CREDENTIALS_{ORIGIN,TARGET}_JSON
# names a JSON file whose "username"/"password" become
# spark.cdm.connect.<role>.{username,password}, with an explicit
# CDM_PROPERTY_SPARK_CDM_CONNECT_<role>_{USERNAME,PASSWORD} env var WINNING
# over the file value (the wrapper skips the file write when the env var is
# non-empty and lets the generic property pass apply it).
_CRED_ROLES = ("TARGET", "ORIGIN")  # wrapper iteration order, entrypoint.sh:81
_CRED_PROPS = ("username", "password")


def credentials_from_env(environ: dict[str, str] | None = None) -> dict[str, str]:
    """Resolve credentials-file injection to {config key: value}.

    Wrapper-faithful semantics:
    - env var unset/empty → that role is a silent no-op (the wrapper
      ``return``s);
    - env var set but file missing → hard error with the wrapper's message;
    - per property, a non-empty CDM_PROPERTY_SPARK_CDM_CONNECT_* env var
      wins over the file (the file value is not emitted for that property).

    One deliberate deviation: the wrapper pipes the file through ``jq -r``,
    so a *missing* JSON property would inject the literal string "null" as
    the password; here that (and non-object JSON / parse errors) is a hard
    CredentialsError — silently authenticating with the password "null" is
    not behavior worth preserving."""
    import json

    env = os.environ if environ is None else environ
    out: dict[str, str] = {}
    for role in _CRED_ROLES:
        env_name = f"CDM_CREDENTIALS_{role}_JSON"
        path = env.get(env_name, "")
        if not path:
            continue
        if not os.path.isfile(path):
            raise CredentialsError(
                f"Unable to find credentials file {path} specified in {env_name}"
            )
        with open(path) as fh:
            try:
                creds = json.load(fh)
            except json.JSONDecodeError as exc:
                raise CredentialsError(
                    f"invalid JSON in credentials file {path}: {exc}"
                ) from exc
        if not isinstance(creds, dict):
            raise CredentialsError(
                f"credentials file {path} must hold a JSON object"
            )
        for prop in _CRED_PROPS:
            override = env.get(
                f"{ENV_PREFIX}SPARK_CDM_CONNECT_{role}_{prop.upper()}", ""
            )
            if override:
                continue  # explicit env var wins; the generic pass applies it
            if prop not in creds or creds[prop] is None:
                raise CredentialsError(
                    f"credentials file {path} is missing {prop!r} for {role}"
                )
            out[f"spark.cdm.connect.{role.lower()}.{prop}"] = str(creds[prop])
    return out


# Run tracking materializes one manifest row per slice on the driver
# (plans/tracking.py record_slices) — bounded state ONLY because numParts is
# bounded. 10^4 slices ≈ a few hundred KB of driver memory; beyond that the
# cap below rejects the config rather than letting the bookkeeping collect
# grow unbounded. (CDM itself defaults numParts to ~2×-of-cores scale; 10^4
# covers any real token-ring split while keeping the tracking tables tiny.)
MAX_NUM_PARTS = 10_000


def _coerce(key: str, value: Any) -> Any:
    typ, _ = KNOWN_KEYS[key]
    if isinstance(value, typ):
        return value
    s = str(value)
    if typ is bool:
        return s.strip().lower() in ("true", "1", "yes")
    return typ(s)


def _resolve_env_indirection(value: Any) -> Any:
    """``env:VAR`` → os.environ['VAR'] (entrypoint.sh:137-141)."""
    if isinstance(value, str) and value.startswith("env:"):
        var = value[4:]
        if var not in os.environ:
            raise UnknownConfigKeyError(f"env indirection {value!r}: ${var} is not set")
        return os.environ[var]
    return value


def env_var_to_key(env_name: str) -> str:
    """CDM_PROPERTY_SPARK_CDM_FOO_BAR → spark.cdm.foo.bar (entrypoint.sh:121-135).

    Note: like the reference, `_` maps to `.` — keys with camelCase segments
    (whereCondition, colSizeInKB...) are matched case-insensitively against the
    registry, mirroring the `sed -i "s/.../I"` at entrypoint.sh:172-174.
    """
    return env_name[len(ENV_PREFIX):].lower().replace("_", ".")


_LOWER_KEY_INDEX = {k.lower(): k for k in KNOWN_KEYS}
_LOWER_NOOP_INDEX = {k.lower(): k for k in ACCEPTED_NOOP_KEYS}


@dataclass
class MigrationConfig:
    values: dict[str, Any] = field(default_factory=dict)
    # accepted-but-not-implemented knobs land here (tier 2; see
    # ACCEPTED_NOOP_KEYS) — raw string values, warned once at construction
    noop_values: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        import warnings

        normalized: dict[str, Any] = {}
        noops: dict[str, str] = dict(self.noop_values)
        for key, value in self.values.items():
            canonical = _LOWER_KEY_INDEX.get(key.lower())
            if canonical is None:
                noop = _LOWER_NOOP_INDEX.get(key.lower())
                if noop is not None:
                    noops[noop] = str(_resolve_env_indirection(value))
                    warnings.warn(
                        f"{noop} is a real CDM property this engine accepts "
                        f"but does not implement ({ACCEPTED_NOOP_KEYS[noop]})",
                        ConfigNoopWarning,
                        stacklevel=2,
                    )
                    continue
                raise UnknownConfigKeyError(
                    f"Error: {key} is not a known spark.cdm property"
                )
            normalized[canonical] = _coerce(canonical, _resolve_env_indirection(value))
        n_parts = normalized.get("spark.cdm.perfops.numParts")
        if n_parts is not None and not (1 <= n_parts <= MAX_NUM_PARTS):
            raise ConfigValueError(
                f"spark.cdm.perfops.numParts={n_parts} out of range [1, {MAX_NUM_PARTS}]"
                " — the run-tracking manifest is numParts driver-side rows"
            )
        self.values = normalized
        self.noop_values = noops

    @classmethod
    def from_env(cls, environ: dict[str, str] | None = None) -> "MigrationConfig":
        env = os.environ if environ is None else environ
        # credentials-file values first, generic CDM_PROPERTY_* pass second —
        # so an explicit env property overwrites the file value, mirroring
        # the wrapper's precedence (entrypoint.sh:66-77)
        raw: dict[str, Any] = dict(credentials_from_env(env))
        raw.update(
            {
                env_var_to_key(name): value
                for name, value in env.items()
                if name.startswith(ENV_PREFIX)
            }
        )
        return cls(raw)

    def get(self, key: str) -> Any:
        if key in ACCEPTED_NOOP_KEYS:
            # tier 2: readable for observability, never consulted by plans
            return self.noop_values.get(key)
        if key not in KNOWN_KEYS:
            raise UnknownConfigKeyError(f"Error: {key} is not a known spark.cdm property")
        return self.values.get(key, KNOWN_KEYS[key][1])

    def with_overrides(self, **kv: Any) -> "MigrationConfig":
        merged = dict(self.values)
        merged.update(kv)
        # carried noop values ride the dedicated field so they are not
        # re-warned on every derived config; NEW noop keys in kv still
        # route (and warn) through the constructor
        return MigrationConfig(merged, noop_values=dict(self.noop_values))

    # parsed feature accessors -------------------------------------------------

    def column_mapping(self) -> dict[str, str]:
        raw = self.get("spark.cdm.schema.origin.column.names.to.target")
        if not raw:
            return {}
        out = {}
        for pair in raw.split(","):
            origin, _, target = pair.partition(":")
            out[origin.strip()] = (target or origin).strip()
        return out

    def constant_columns(self) -> dict[str, tuple[str, str]]:
        names = self.get("spark.cdm.feature.constantColumns.names")
        if not names:
            return {}
        values = self.get("spark.cdm.feature.constantColumns.values").split(",")
        types = self.get("spark.cdm.feature.constantColumns.types").split(",")
        return {
            n.strip(): (v.strip(), t.strip())
            for n, v, t in zip(names.split(","), values, types)
        }

    def pk_columns(self) -> list[str]:
        raw = self.get("spark.cdm.schema.pk")
        return [c.strip() for c in raw.split(",") if c.strip()]


def dispatch_job(job_name: str) -> str:
    """Job-name → canonical job (entrypoint.sh:230-243)."""
    canonical = JOB_ALIASES.get(job_name.strip().lower())
    if canonical is None:
        raise UnknownJobError(
            f"Error: unknown job {job_name!r}; expected one of {sorted(JOB_ALIASES)}"
        )
    return canonical
