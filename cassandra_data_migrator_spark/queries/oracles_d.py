"""DuckDB oracle SQL chunk (round-10 keys).

The sql_frontend_ds* oracles are the IDENTICAL SQL text the Spark side
submits (one text, two engines), imported from sql_frontend.
"""

from __future__ import annotations

from cassandra_data_migrator_spark.queries.sql_frontend import (  # noqa: F401
    SQL_DS1_SQL,
    SQL_DS2_SQL,
    SQL_DS3_SQL,
    SQL_DS4_SQL,
    SQL_DS5_SQL,
)


def oracles_d() -> dict[str, str]:
    return {
        "sql_frontend_ds1": SQL_DS1_SQL,
        "sql_frontend_ds2": SQL_DS2_SQL,
        "sql_frontend_ds3": SQL_DS3_SQL,
        "sql_frontend_ds4": SQL_DS4_SQL,
        "sql_frontend_ds5": SQL_DS5_SQL,
    }
