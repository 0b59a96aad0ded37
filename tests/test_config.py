"""Config-layer semantics (SURVEY.md §2 #7): closed key set, env injection,
env: indirection, job dispatch — mirroring /root/reference/entrypoint.sh
88-179 / 230-243 behavior."""

import pytest

from cassandra_data_migrator_spark.config import (
    MigrationConfig,
    UnknownConfigKeyError,
    UnknownJobError,
    dispatch_job,
    env_var_to_key,
)


def test_known_key_roundtrip():
    cfg = MigrationConfig({"spark.cdm.filter.cassandra.whereCondition": "x > 1"})
    assert cfg.get("spark.cdm.filter.cassandra.whereCondition") == "x > 1"


def test_unknown_key_is_hard_error():
    with pytest.raises(UnknownConfigKeyError):
        MigrationConfig({"spark.cdm.bogus.key": "1"})


def test_defaults_apply():
    cfg = MigrationConfig({})
    assert cfg.get("spark.cdm.perfops.numParts") == 32
    assert cfg.get("spark.cdm.autocorrect.missing") is False


def test_get_unknown_key_raises():
    with pytest.raises(UnknownConfigKeyError):
        MigrationConfig({}).get("spark.cdm.not.a.key")


def test_type_coercion():
    cfg = MigrationConfig(
        {
            "spark.cdm.perfops.numParts": "64",
            "spark.cdm.autocorrect.missing": "TRUE",
        }
    )
    assert cfg.get("spark.cdm.perfops.numParts") == 64
    assert cfg.get("spark.cdm.autocorrect.missing") is True


def test_env_var_name_mapping():
    # entrypoint.sh:121-135 — lowercase, underscores → dots
    assert (
        env_var_to_key("CDM_PROPERTY_SPARK_CDM_PERFOPS_NUMPARTS")
        == "spark.cdm.perfops.numparts"
    )


def test_from_env_injection_case_insensitive():
    env = {
        "CDM_PROPERTY_SPARK_CDM_PERFOPS_NUMPARTS": "8",
        "UNRELATED": "x",
    }
    cfg = MigrationConfig.from_env(env)
    assert cfg.get("spark.cdm.perfops.numParts") == 8


def test_from_env_unknown_key_aborts():
    # entrypoint.sh:145-149 — unknown key is a hard error
    with pytest.raises(UnknownConfigKeyError):
        MigrationConfig.from_env({"CDM_PROPERTY_SPARK_CDM_NOPE": "1"})


def test_env_indirection(monkeypatch):
    # entrypoint.sh:137-141 — value "env:VAR" dereferences $VAR
    monkeypatch.setenv("MY_WHERE", "l_quantity > 5")
    cfg = MigrationConfig(
        {"spark.cdm.filter.cassandra.whereCondition": "env:MY_WHERE"}
    )
    assert cfg.get("spark.cdm.filter.cassandra.whereCondition") == "l_quantity > 5"


def test_env_indirection_missing_var():
    with pytest.raises(UnknownConfigKeyError):
        MigrationConfig({"spark.cdm.filter.cassandra.whereCondition": "env:NOPE_VAR"})


def test_column_mapping_parse():
    cfg = MigrationConfig(
        {"spark.cdm.schema.origin.column.names.to.target": "a:x, b:y ,c"}
    )
    assert cfg.column_mapping() == {"a": "x", "b": "y", "c": "c"}


def test_constant_columns_parse():
    cfg = MigrationConfig(
        {
            "spark.cdm.feature.constantColumns.names": "f1,f2",
            "spark.cdm.feature.constantColumns.values": "abc,42",
            "spark.cdm.feature.constantColumns.types": "string,bigint",
        }
    )
    assert cfg.constant_columns() == {"f1": ("abc", "string"), "f2": ("42", "bigint")}


def test_job_dispatch_aliases():
    # entrypoint.sh:230-243
    assert dispatch_job("migrate") == "migrate"
    assert dispatch_job("DiffData") == "validate"
    assert dispatch_job("validate") == "validate"
    assert dispatch_job("GuardrailCheck") == "guardrail"


def test_job_dispatch_unknown_aborts():
    with pytest.raises(UnknownJobError):
        dispatch_job("compact")


def test_num_parts_cap_enforced():
    """The run-tracking manifest collects numParts driver-side rows
    (plans/tracking.py record_slices) — bounded only because config
    validation enforces the cap, not assumes it."""
    from cassandra_data_migrator_spark.config import ConfigValueError, MigrationConfig

    ok = MigrationConfig({"spark.cdm.perfops.numParts": 10_000})
    assert ok.get("spark.cdm.perfops.numParts") == 10_000
    with pytest.raises(ConfigValueError):
        MigrationConfig({"spark.cdm.perfops.numParts": 10_001})
    with pytest.raises(ConfigValueError):
        MigrationConfig({"spark.cdm.perfops.numParts": 0})
