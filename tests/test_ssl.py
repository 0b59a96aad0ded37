"""TLS truststore plumbing (reference entrypoint.sh:188-221 analog) —
EXECUTED for real: keytool ships with the JDK Spark requires, so the test
generates a self-signed certificate, runs the import loop against a JSON
settings file, and verifies the truststore contents."""

import json
import os
import subprocess

import pytest

from cassandra_data_migrator_spark.sources.ssl import (
    SSL_SETTINGS_ENV,
    SslSettingsError,
    connector_ssl_options,
    import_ssl_certificates,
    keytool_import_args,
    load_ssl_store_settings,
)


def _make_cert(tmp_path, alias: str):
    """Self-signed cert exported to a file, like the ones a user hands the
    reference wrapper."""
    ks = str(tmp_path / f"{alias}-src.jks")
    cer = str(tmp_path / f"{alias}.cer")
    subprocess.run(
        [
            "keytool", "-genkeypair", "-alias", alias, "-keyalg", "RSA",
            "-keysize", "2048", "-validity", "1", "-keystore", ks,
            "-storepass", "changeit", "-dname", f"CN={alias},O=test",
        ],
        check=True, capture_output=True,
    )
    subprocess.run(
        [
            "keytool", "-exportcert", "-alias", alias, "-keystore", ks,
            "-storepass", "changeit", "-file", cer,
        ],
        check=True, capture_output=True,
    )
    return cer


def test_import_loop_end_to_end(tmp_path):
    cer_a = _make_cert(tmp_path, "node-a")
    cer_b = _make_cert(tmp_path, "node-b")
    trust = str(tmp_path / "trust.jks")
    settings = {
        "origin": {"alias": "node-a", "file": cer_a,
                   "keystore": trust, "storepass": "trustpass"},
        "target": {"alias": "node-b", "file": cer_b,
                   "keystore": trust, "storepass": "trustpass"},
    }
    settings_path = str(tmp_path / "ssl.json")
    with open(settings_path, "w") as fh:
        json.dump(settings, fh)
    imported = import_ssl_certificates(settings_path)
    assert imported == ["node-a", "node-b"]
    listed = subprocess.run(
        ["keytool", "-list", "-keystore", trust, "-storepass", "trustpass"],
        check=True, capture_output=True, text=True,
    ).stdout
    assert "node-a" in listed and "node-b" in listed
    assert "trustedCertEntry" in listed


def test_env_var_semantics(tmp_path, monkeypatch):
    # unset/empty -> silent no-op (the wrapper returns)
    monkeypatch.delenv(SSL_SETTINGS_ENV, raising=False)
    assert import_ssl_certificates() == []
    monkeypatch.setenv(SSL_SETTINGS_ENV, "")
    assert import_ssl_certificates() == []
    # set but missing -> hard error (the wrapper error_exits)
    monkeypatch.setenv(SSL_SETTINGS_ENV, str(tmp_path / "nope.json"))
    with pytest.raises(SslSettingsError, match="Unable to find"):
        import_ssl_certificates()


def test_settings_validation(tmp_path):
    p = str(tmp_path / "s.json")

    def write(obj):
        with open(p, "w") as fh:
            json.dump(obj, fh)

    write({"a": {"alias": "x", "file": "f", "keystore": "k"}})  # missing prop
    with pytest.raises(SslSettingsError, match="missing"):
        load_ssl_store_settings(p)
    write({"a": {"alias": "x", "file": "f", "keystore": "k",
                 "storepass": "s", "typo": "v"}})
    with pytest.raises(SslSettingsError, match="unknown"):
        load_ssl_store_settings(p)
    write(["not", "an", "object"])
    with pytest.raises(SslSettingsError, match="JSON object"):
        load_ssl_store_settings(p)
    with open(p, "w") as fh:
        fh.write("{broken")
    with pytest.raises(SslSettingsError, match="invalid JSON"):
        load_ssl_store_settings(p)


def test_keytool_args_and_connector_options():
    from cassandra_data_migrator_spark.sources.ssl import (
        STOREPASS_ENV,
        keytool_env,
    )

    props = {"alias": "a", "file": "f.cer", "keystore": "t.jks",
             "storepass": "sekret-p"}
    args = keytool_import_args(props)
    assert args[:3] == ["keytool", "-import", "-trustcacerts"]
    assert "-noprompt" in args
    for flag, val in (("-alias", "a"), ("-file", "f.cer"),
                      ("-keystore", "t.jks"),
                      ("-storepass:env", STOREPASS_ENV)):
        assert args[args.index(flag) + 1] == val
    # the password must NEVER appear in argv (process lists are
    # world-readable); it travels only via the -storepass:env environment
    assert "sekret-p" not in " ".join(args)
    assert keytool_env(props)[STOREPASS_ENV] == "sekret-p"
    opts = connector_ssl_options("t.jks", "p", enabled_algorithms="TLS_RSA")
    assert opts["spark.cassandra.connection.ssl.enabled"] == "true"
    assert opts["spark.cassandra.connection.ssl.trustStore.path"] == "t.jks"
    assert opts["spark.cassandra.connection.ssl.trustStore.password"] == "p"
    assert opts["spark.cassandra.connection.ssl.enabledAlgorithms"] == "TLS_RSA"
    assert "enabledAlgorithms" not in str(connector_ssl_options("t", "p").keys())


def test_import_failure_surfaces_keytool_error(tmp_path):
    settings = {
        "bad": {"alias": "x", "file": str(tmp_path / "missing.cer"),
                "keystore": str(tmp_path / "t.jks"), "storepass": "p"},
    }
    p = str(tmp_path / "s.json")
    with open(p, "w") as fh:
        json.dump(settings, fh)
    with pytest.raises(SslSettingsError, match="keytool import failed"):
        import_ssl_certificates(p)


def test_import_loop_is_idempotent(tmp_path):
    """The hook runs on EVERY job launch: a second run against the same
    persistent truststore must skip already-present aliases (keytool
    -import itself hard-fails on 'alias already exists')."""
    cer = _make_cert(tmp_path, "node-x")
    trust = str(tmp_path / "trust.jks")
    p = str(tmp_path / "ssl.json")
    with open(p, "w") as fh:
        json.dump({"origin": {"alias": "node-x", "file": cer,
                              "keystore": trust, "storepass": "trustpw"}}, fh)
    assert import_ssl_certificates(p) == ["node-x"]
    # second launch: no error, nothing newly imported
    assert import_ssl_certificates(p) == []
    listed = subprocess.run(
        ["keytool", "-list", "-keystore", trust, "-storepass", "trustpw"],
        check=True, capture_output=True, text=True,
    ).stdout
    assert listed.count("node-x") == 1
