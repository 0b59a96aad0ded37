"""Vector functions over ``array<float>`` embedding columns (SURVEY.md §2b E3;
CQL ``vector<float, n>`` analog, SURVEY.md §1.2).

Dot products / norms / cosine are built from ``zip_with`` + ``aggregate`` —
JVM-side higher-order functions, no Python in the loop. Elements are cast to
DOUBLE before multiplying so the arithmetic matches the DuckDB oracle
(float*float would round differently). For wide fan-out scoring there is also
an Arrow-batched pandas_udf variant (numpy matmul) that beats per-row
expression evaluation when k·n is large.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (cast upstream)."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_udf_factory():
    """Arrow-batched scorer: (embedding: list<float>, query: list<float>) →
    double. Only used on the wide fan-out path; built lazily so importing this
    module never requires pandas/pyarrow."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.map(lambda x: np.asarray(x, dtype=np.float64)))
        bv = np.stack(b.map(lambda x: np.asarray(x, dtype=np.float64)))
        num = (av * bv).sum(axis=1)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        return pd.Series(num / den)

    return _cos
