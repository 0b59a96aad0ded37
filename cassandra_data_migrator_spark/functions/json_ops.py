"""JSON column features (SURVEY.md §2 #11 ExtractJson, #12 ExplodeMap;
CDM features [upstream@6.0.1]).

ExtractJson pulls one field out of a JSON-text origin column into a named
target column. ExplodeMap turns a map column into one output row per entry
(the entry key joins the target PK). Fixtures carry JSON text in
``events.props``; a real Cassandra ``map<k,v>`` column arrives as MapType and
skips the ``from_json`` step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_json(c: Column | str, field: str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.get_json_object(c, f"$.{field}")


def json_to_map(c: Column | str, value_type: str = "string") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.from_json(c, f"map<string,{value_type}>")


def explode_map(
    df: DataFrame,
    map_col: Column | str,
    key_alias: str = "prop_key",
    value_alias: str = "prop_value",
    keep: list[str] | None = None,
) -> DataFrame:
    """One row per map entry; ``keep`` columns (e.g. the PK) are carried along."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    keep_cols = [F.col(c) for c in (keep or df.columns)]
    return df.select(*keep_cols, F.explode(m).alias(key_alias, value_alias))
