"""Logging config injection (reference entrypoint.sh:184-186 / log4j.xml:27
analog): CDM_LOGGING_* env vars -> Python logger levels, with env:VAR
indirection and hard errors for unmappable keys/levels."""

import logging

import pytest

from cassandra_data_migrator_spark.logging_bridge import (
    PACKAGE_LOGGER,
    LoggingConfigError,
    configure_logging_from_env,
)


def test_package_level_analog_of_log4j_property():
    applied = configure_logging_from_env({"CDM_LOGGING_LOG_LEVEL": "debug"})
    assert applied == {PACKAGE_LOGGER: "DEBUG"}
    assert logging.getLogger(PACKAGE_LOGGER).level == logging.DEBUG
    logging.getLogger(PACKAGE_LOGGER).setLevel(logging.NOTSET)


def test_dotted_logger_key_translation_and_aliases():
    applied = configure_logging_from_env(
        {"CDM_LOGGING_COM_EXAMPLE_DRIVER_LEVEL": "WARN"}
    )
    assert applied == {"com.example.driver": "WARNING"}
    assert logging.getLogger("com.example.driver").level == logging.WARNING
    # log4j-only names map onto Python levels
    applied = configure_logging_from_env({"CDM_LOGGING_X_LEVEL": "trace"})
    assert applied == {"x": "DEBUG"}


def test_double_underscore_escapes_literal_underscore():
    """'__' -> literal '_' so underscore-named loggers (this package's own
    submodules) are individually addressable — without the escape the
    wrapper-faithful mapping turns every '_' into '.' and per-module level
    control silently cannot work."""
    applied = configure_logging_from_env(
        {
            "CDM_LOGGING_CASSANDRA__DATA__MIGRATOR__SPARK_SOURCES_LEVEL":
                "WARN"
        }
    )
    assert applied == {"cassandra_data_migrator_spark.sources": "WARNING"}
    assert (
        logging.getLogger("cassandra_data_migrator_spark.sources").level
        == logging.WARNING
    )
    logging.getLogger("cassandra_data_migrator_spark.sources").setLevel(
        logging.NOTSET
    )


def test_env_indirection(monkeypatch):
    # indirection resolves against the SAME mapping that carries the
    # CDM_LOGGING_* entries — an injected env must be self-contained
    applied = configure_logging_from_env(
        {"CDM_LOGGING_Y_LEVEL": "env:MY_LEVEL", "MY_LEVEL": "ERROR"}
    )
    assert applied == {"y": "ERROR"}
    # default (no arg) reads live os.environ, the production path
    monkeypatch.setenv("CDM_LOGGING_Y_LEVEL", "env:MY_LEVEL")
    monkeypatch.setenv("MY_LEVEL", "WARN")
    assert configure_logging_from_env() == {"y": "WARNING"}
    with pytest.raises(LoggingConfigError, match="is not set"):
        configure_logging_from_env({"CDM_LOGGING_Y_LEVEL": "env:UNSET_VAR_XYZ"})


def test_hard_errors_mirror_wrapper_error_exit():
    with pytest.raises(LoggingConfigError, match="Unable to map"):
        configure_logging_from_env({"CDM_LOGGING_SOME_RANDOM_KNOB": "on"})
    with pytest.raises(LoggingConfigError, match="invalid log level"):
        configure_logging_from_env({"CDM_LOGGING_Z_LEVEL": "LOUD"})


def test_noop_without_matching_vars():
    assert configure_logging_from_env({"PATH": "/bin", "HOME": "/root"}) == {}
