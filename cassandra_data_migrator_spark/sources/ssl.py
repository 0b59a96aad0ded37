"""TLS truststore plumbing — the analog of the reference wrapper's SSL
certificate import loop (reference entrypoint.sh:188-221
``import_ssl_certificates``: env ``CMD_SSL_STORE_SETTINGS_JSON`` names a
JSON file whose top-level keys are certificate sets, each carrying
``alias`` / ``file`` / ``keystore`` / ``storepass``; every set is imported
into a JKS truststore via ``keytool -import -trustcacerts -noprompt``).

Semantics preserved exactly:
- env var unset/empty → silent no-op (the wrapper ``return``s);
- env var set but the file missing → hard error (``error_exit``);
- every certificate set imported with the same keytool flags.

Plus the half the wrapper leaves to the user: ``connector_ssl_options``
maps the resulting truststore to the spark-cassandra-connector's documented
SSL options so a TLS cluster connection is one config call. keytool ships
with the JDK Spark already requires, so unlike the Cassandra connector this
path is fully executable (and executed) in the test environment —
tests/test_ssl.py generates a real self-signed certificate, imports it,
and verifies the truststore contents.
"""

from __future__ import annotations

import json
import os
import subprocess

# The reference wrapper's env var name, verbatim (entrypoint.sh:189 —
# including its "CMD_" spelling) so a user's existing deployment config
# keeps working unchanged.
SSL_SETTINGS_ENV = "CMD_SSL_STORE_SETTINGS_JSON"

# env var used for keytool's -storepass:env indirection (keeps the
# truststore password out of the world-readable process argv)
STOREPASS_ENV = "CDM_KEYTOOL_STOREPASS"

_REQUIRED_PROPS = ("alias", "file", "keystore", "storepass")


class SslSettingsError(RuntimeError):
    pass


def load_ssl_store_settings(path: str) -> dict[str, dict[str, str]]:
    """Parse and validate the certificate-set JSON. Every top-level entry
    must carry all four properties; unknown extras are rejected so a typo'd
    property name fails here instead of silently importing with a null."""
    if not os.path.isfile(path):
        raise SslSettingsError(f"Unable to find SSL store settings file {path}")
    with open(path) as fh:
        try:
            raw = json.load(fh)
        except json.JSONDecodeError as exc:
            raise SslSettingsError(f"invalid JSON in {path}: {exc}") from exc
    if not isinstance(raw, dict):
        raise SslSettingsError(f"{path} must hold a JSON object of cert sets")
    out: dict[str, dict[str, str]] = {}
    for name, props in raw.items():
        if not isinstance(props, dict):
            raise SslSettingsError(f"cert set {name!r} must be an object")
        missing = [p for p in _REQUIRED_PROPS if p not in props]
        if missing:
            raise SslSettingsError(f"cert set {name!r} missing {missing}")
        unknown = [p for p in props if p not in _REQUIRED_PROPS]
        if unknown:
            raise SslSettingsError(f"cert set {name!r} has unknown keys {unknown}")
        out[name] = {p: str(props[p]) for p in _REQUIRED_PROPS}
    return out


def keytool_import_args(props: dict[str, str]) -> list[str]:
    """The exact keytool invocation for one certificate set (isolated so
    the argument contract is unit-testable without running keytool). The
    password travels via keytool's documented ``-storepass:env`` option
    modifier, never as an argv literal — argv is world-readable in the
    process list for the life of the keytool run (the reference wrapper
    passes it inline; that flaw is not worth reproducing). Pair with
    :func:`keytool_env` for the subprocess environment."""
    return [
        "keytool",
        "-import",
        "-trustcacerts",
        "-alias", props["alias"],
        "-noprompt",
        "-file", props["file"],
        "-keystore", props["keystore"],
        "-storepass:env", STOREPASS_ENV,
    ]


def keytool_env(props: dict[str, str]) -> dict[str, str]:
    """Subprocess environment carrying the truststore password for the
    ``-storepass:env`` indirection (environments are private to the
    process, unlike argv)."""
    env = dict(os.environ)
    env[STOREPASS_ENV] = props["storepass"]
    return env


def _alias_present(props: dict[str, str]) -> bool:
    """True when the alias already exists in the target truststore —
    keytool -import is NOT idempotent ('alias already exists' is a hard
    failure), and the import loop runs on every job launch, so a
    persistent truststore must be probed first."""
    if not os.path.exists(props["keystore"]):
        return False
    proc = subprocess.run(
        [
            "keytool", "-list",
            "-alias", props["alias"],
            "-keystore", props["keystore"],
            "-storepass:env", STOREPASS_ENV,
        ],
        env=keytool_env(props),
        capture_output=True,
        text=True,
    )
    return proc.returncode == 0


def import_ssl_certificates(settings_path: str | None = None) -> list[str]:
    """Import every configured certificate into its truststore; returns the
    list of newly imported aliases (already-present aliases are skipped, so
    the per-job-launch hook is idempotent against a persistent truststore).
    ``settings_path=None`` reads the reference's env var; unset/empty →
    no-op (empty list), set-but-missing → error."""
    if settings_path is None:
        settings_path = os.environ.get(SSL_SETTINGS_ENV, "")
    if not settings_path:
        return []
    settings = load_ssl_store_settings(settings_path)
    imported: list[str] = []
    for name, props in settings.items():
        if _alias_present(props):
            continue
        proc = subprocess.run(
            keytool_import_args(props),
            env=keytool_env(props),
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            raise SslSettingsError(
                f"keytool import failed for cert set {name!r}: "
                f"{proc.stderr.strip() or proc.stdout.strip()}"
            )
        imported.append(props["alias"])
    return imported


def connector_ssl_options(
    truststore_path: str,
    truststore_password: str,
    enabled_algorithms: str | None = None,
) -> dict[str, str]:
    """spark-cassandra-connector 3.5 SSL options (doc/reference.md,
    connection.ssl.*) for a JKS truststore produced by the import loop —
    the config half entrypoint.sh leaves to the user's spark-submit."""
    out = {
        "spark.cassandra.connection.ssl.enabled": "true",
        "spark.cassandra.connection.ssl.trustStore.path": truststore_path,
        "spark.cassandra.connection.ssl.trustStore.password": truststore_password,
        "spark.cassandra.connection.ssl.trustStore.type": "JKS",
    }
    if enabled_algorithms:
        out["spark.cassandra.connection.ssl.enabledAlgorithms"] = enabled_algorithms
    return out
