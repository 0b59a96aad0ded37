"""DuckDB oracle registry: oracle_sql() merges the per-chunk dicts."""

from __future__ import annotations

from cassandra_data_migrator_spark.queries.oracles_a import (  # noqa: F401
    oracles_a,
)
from cassandra_data_migrator_spark.queries.oracles_b import (  # noqa: F401
    oracles_b,
)
from cassandra_data_migrator_spark.queries.oracles_c import (  # noqa: F401
    oracles_c,
)
from cassandra_data_migrator_spark.queries.oracles_d import (  # noqa: F401
    oracles_d,
)
from cassandra_data_migrator_spark.queries.oracles_e import (  # noqa: F401
    oracles_e,
)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(oracles_a())
    out.update(oracles_b())
    out.update(oracles_c())
    out.update(oracles_d())
    out.update(oracles_e())
    return out
