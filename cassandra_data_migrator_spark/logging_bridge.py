"""Logging config injection — the analog of the reference wrapper's log4j
surface (reference entrypoint.sh:184-186: env vars prefixed
``CDM_LOGGING_`` are lowercased, ``_``→``.``, and substituted into the
log4j configuration, with ``env:VAR`` value indirection and a hard error
for a property the file doesn't know; reference log4j.xml:27: the
``com.datastax.cdm`` logger level rides the ``...log.level`` property,
default INFO).

Python translation of the same contract:
- ``CDM_LOGGING_LOG_LEVEL=DEBUG`` → the engine package logger (the direct
  analog of log4j.xml:27's cdm-logger property);
- ``CDM_LOGGING_<DOTTED_PATH>_LEVEL=WARN`` → ``logging.getLogger(
  "<dotted.path>")`` (key lowercased, underscores to dots — the same
  ``tr '_' '.'`` the wrapper applies);
- values support the wrapper's ``env:OTHER_VAR`` indirection;
- an invalid level or a key that doesn't end in ``.level`` is a hard
  error, mirroring the wrapper's error_exit for unknown properties —
  never a silently-ignored knob.
"""

from __future__ import annotations

import logging
import os

LOGGING_ENV_PREFIX = "CDM_LOGGING_"
PACKAGE_LOGGER = "cassandra_data_migrator_spark"

_LEVELS = {"CRITICAL", "FATAL", "ERROR", "WARN", "WARNING", "INFO", "DEBUG", "TRACE"}
# log4j names Python's logging lacks
_LEVEL_ALIASES = {"FATAL": "CRITICAL", "WARN": "WARNING", "TRACE": "DEBUG"}


class LoggingConfigError(RuntimeError):
    pass


def _resolve_value(raw: str, env: dict[str, str]) -> str:
    # indirection resolves against the SAME environment mapping the caller
    # supplied, never live os.environ — an injected env (tests, config
    # replay) must be self-contained
    if raw.startswith("env:"):
        name = raw[4:]
        if name not in env:
            raise LoggingConfigError(
                f"logging value indirection {raw!r}: ${name} is not set"
            )
        return env[name]
    return raw


def configure_logging_from_env(
    env: dict[str, str] | None = None,
) -> dict[str, str]:
    """Apply every ``CDM_LOGGING_*`` entry; returns {logger_name: level}.
    No matching env vars → no-op (the wrapper logs 'using default values'
    and returns 0)."""
    env = dict(os.environ if env is None else env)
    applied: dict[str, str] = {}
    for var, raw in sorted(env.items()):
        if not var.startswith(LOGGING_ENV_PREFIX):
            continue
        # wrapper-faithful '_'→'.' mapping, PLUS an escape the wrapper
        # lacks: '__' maps to a literal '_' so loggers whose names contain
        # underscores (this package's own submodules, e.g.
        # cassandra_data_migrator_spark.sources) are addressable at all —
        # without it per-module level control silently cannot work
        conf_key = (
            var[len(LOGGING_ENV_PREFIX):]
            .lower()
            .replace("__", "\x00")
            .replace("_", ".")
            .replace("\x00", "_")
        )
        # "log.level" itself ends with ".level", so one check covers both
        # the package-logger shorthand and dotted logger paths
        if not conf_key.endswith(".level"):
            raise LoggingConfigError(
                f"Unable to map logging property {conf_key!r} "
                "(expected <logger.path>.level or log.level)"
            )
        value = _resolve_value(raw, env).upper()
        if value not in _LEVELS:
            raise LoggingConfigError(
                f"invalid log level {value!r} for {conf_key!r}"
            )
        level = _LEVEL_ALIASES.get(value, value)
        logger_name = (
            PACKAGE_LOGGER
            if conf_key == "log.level"
            else conf_key[: -len(".level")]
        )
        logging.getLogger(logger_name).setLevel(level)
        applied[logger_name] = level
    return applied
