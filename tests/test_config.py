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


# --- credentials-file injection (entrypoint.sh:52-86 analog) -------------


def _cred_file(tmp_path, name, obj):
    import json

    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_credentials_file_read(tmp_path):
    """Behavior 1: the file's username/password become connect properties
    for that role; the other role stays untouched."""
    from cassandra_data_migrator_spark.config import credentials_from_env

    path = _cred_file(tmp_path, "o.json", {"username": "alice", "password": "s3cr3t"})
    got = credentials_from_env({"CDM_CREDENTIALS_ORIGIN_JSON": path})
    assert got == {
        "spark.cdm.connect.origin.username": "alice",
        "spark.cdm.connect.origin.password": "s3cr3t",
    }
    cfg = MigrationConfig.from_env({"CDM_CREDENTIALS_ORIGIN_JSON": path})
    assert cfg.get("spark.cdm.connect.origin.username") == "alice"
    assert cfg.get("spark.cdm.connect.origin.password") == "s3cr3t"
    assert cfg.get("spark.cdm.connect.target.username") == ""


def test_credentials_env_override_wins(tmp_path):
    """Behavior 2: an explicit CDM_PROPERTY_SPARK_CDM_CONNECT_* env var wins
    over the file value for that property only (entrypoint.sh:66-77)."""
    path = _cred_file(
        tmp_path, "t.json", {"username": "file-user", "password": "file-pass"}
    )
    cfg = MigrationConfig.from_env(
        {
            "CDM_CREDENTIALS_TARGET_JSON": path,
            "CDM_PROPERTY_SPARK_CDM_CONNECT_TARGET_USERNAME": "env-user",
        }
    )
    assert cfg.get("spark.cdm.connect.target.username") == "env-user"
    assert cfg.get("spark.cdm.connect.target.password") == "file-pass"


def test_credentials_missing_file_is_hard_error(tmp_path):
    """Behavior 3: env var set but file absent aborts with the wrapper's
    message; env var unset/empty is a silent no-op."""
    from cassandra_data_migrator_spark.config import (
        CredentialsError,
        credentials_from_env,
    )

    with pytest.raises(CredentialsError, match="Unable to find credentials file"):
        credentials_from_env(
            {"CDM_CREDENTIALS_ORIGIN_JSON": str(tmp_path / "nope.json")}
        )
    assert credentials_from_env({}) == {}
    assert credentials_from_env({"CDM_CREDENTIALS_ORIGIN_JSON": ""}) == {}


def test_credentials_bad_content_is_hard_error(tmp_path):
    """Deviation from the wrapper, documented in credentials_from_env: a
    missing JSON property (where jq -r would inject the literal 'null') or
    unparseable/non-object JSON is a hard error, never a silent 'null'
    password."""
    from cassandra_data_migrator_spark.config import (
        CredentialsError,
        credentials_from_env,
    )

    missing = _cred_file(tmp_path, "m.json", {"username": "only-user"})
    with pytest.raises(CredentialsError, match="missing 'password'"):
        credentials_from_env({"CDM_CREDENTIALS_ORIGIN_JSON": missing})
    nullpw = _cred_file(tmp_path, "n.json", {"username": "u", "password": None})
    with pytest.raises(CredentialsError, match="missing 'password'"):
        credentials_from_env({"CDM_CREDENTIALS_ORIGIN_JSON": nullpw})
    notobj = _cred_file(tmp_path, "a.json", ["u", "p"])
    with pytest.raises(CredentialsError, match="JSON object"):
        credentials_from_env({"CDM_CREDENTIALS_ORIGIN_JSON": notobj})
    broken = tmp_path / "b.json"
    broken.write_text("{nope")
    with pytest.raises(CredentialsError, match="invalid JSON"):
        credentials_from_env({"CDM_CREDENTIALS_ORIGIN_JSON": str(broken)})


def test_credentials_both_roles(tmp_path):
    o = _cred_file(tmp_path, "o.json", {"username": "ou", "password": "op"})
    t = _cred_file(tmp_path, "t.json", {"username": "tu", "password": "tp"})
    cfg = MigrationConfig.from_env(
        {"CDM_CREDENTIALS_ORIGIN_JSON": o, "CDM_CREDENTIALS_TARGET_JSON": t}
    )
    assert cfg.get("spark.cdm.connect.origin.username") == "ou"
    assert cfg.get("spark.cdm.connect.target.password") == "tp"


def test_credentials_reach_connector_auth_options(tmp_path):
    """End of the chain: file -> config -> connector auth option map
    (spark.cassandra.auth.*), per role, empty -> unauthenticated."""
    from cassandra_data_migrator_spark.sources.cassandra import (
        connector_auth_options_from_config,
    )

    o = _cred_file(tmp_path, "o.json", {"username": "ou", "password": "op"})
    cfg = MigrationConfig.from_env({"CDM_CREDENTIALS_ORIGIN_JSON": o})
    assert connector_auth_options_from_config(cfg, "origin") == {
        "spark.cassandra.auth.username": "ou",
        "spark.cassandra.auth.password": "op",
    }
    assert connector_auth_options_from_config(cfg, "target") == {}
    with pytest.raises(ValueError, match="role"):
        connector_auth_options_from_config(cfg, "both")


class TestConfigTiers:
    """The three-tier surface (r08 verdict #7): implemented (KNOWN_KEYS) /
    accepted-noop (real CDM 6.0.1 knobs, warned + recorded) / unknown
    (hard error, the wrapper's entrypoint.sh:145-149 behavior)."""

    def test_noop_key_accepted_with_warning_and_recorded(self):
        import warnings

        from cassandra_data_migrator_spark.config import (
            ConfigNoopWarning,
            MigrationConfig,
        )

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cfg = MigrationConfig(
                {
                    "spark.cdm.perfops.consistency.read": "LOCAL_QUORUM",
                    "spark.cdm.schema.pk": "user_id",
                }
            )
        assert any(issubclass(x.category, ConfigNoopWarning) for x in w)
        # tier 2 is observable but never enters the implemented values
        assert cfg.get("spark.cdm.perfops.consistency.read") == "LOCAL_QUORUM"
        assert "spark.cdm.perfops.consistency.read" not in cfg.values
        assert cfg.noop_values == {
            "spark.cdm.perfops.consistency.read": "LOCAL_QUORUM"
        }
        # implemented tier untouched
        assert cfg.get("spark.cdm.schema.pk") == "user_id"

    def test_unknown_key_still_hard_errors(self):
        import pytest

        from cassandra_data_migrator_spark.config import (
            MigrationConfig,
            UnknownConfigKeyError,
        )

        with pytest.raises(UnknownConfigKeyError):
            MigrationConfig({"spark.cdm.perfops.consistency.raed": "ONE"})  # typo
        with pytest.raises(UnknownConfigKeyError):
            MigrationConfig({"spark.cdm.not.a.real.knob": "1"})

    def test_noop_key_case_insensitive_and_env_injected(self):
        import warnings

        from cassandra_data_migrator_spark.config import MigrationConfig

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg = MigrationConfig.from_env(
                {
                    "CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_TLS_ENABLED": "true",
                    "CDM_PROPERTY_SPARK_CDM_SCHEMA_PK": "k",
                }
            )
        assert cfg.get("spark.cdm.connect.origin.tls.enabled") == "true"
        assert cfg.get("spark.cdm.schema.pk") == "k"

    def test_with_overrides_carries_noops_without_rewarning(self):
        import warnings

        from cassandra_data_migrator_spark.config import MigrationConfig

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg = MigrationConfig(
                {"spark.cdm.perfops.printStatsAfter": "100000"}
            )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cfg2 = cfg.with_overrides(**{"spark.cdm.schema.pk": "id"})
        assert not w, "carried noop values must not re-warn"
        assert cfg2.noop_values == {
            "spark.cdm.perfops.printStatsAfter": "100000"
        }
        assert cfg2.get("spark.cdm.schema.pk") == "id"

    def test_every_noop_key_reason_documented(self):
        from cassandra_data_migrator_spark.config import ACCEPTED_NOOP_KEYS

        assert all(reason.strip() for reason in ACCEPTED_NOOP_KEYS.values())
        # the two registries never overlap (a key has exactly one tier)
        from cassandra_data_migrator_spark.config import KNOWN_KEYS

        assert not set(ACCEPTED_NOOP_KEYS) & set(KNOWN_KEYS)
