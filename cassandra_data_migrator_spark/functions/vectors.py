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


def unit_udf_factory():
    """Arrow-batched unit-normalizer: array<double> → x / norm(x),
    BIT-IDENTICAL to the expression form ``transform(v, x / norm(v))``.

    Why it exists (optimization r12, guide §4.1/§4.2): higher-order
    functions are CodegenFallback, and a lambda that closes over ``norm(v)``
    re-evaluates the whole norm fold PER ELEMENT — O(dim²) interpreted steps
    per row (4 096 at dim=64; measured as the dominant cost of the SQ8
    audits' corpus passes). The kernel preserves the fold's exact float
    semantics: squares are accumulated SEQUENTIALLY over dims (vectorized
    across rows — each numpy add/multiply is the same IEEE-754 double op the
    JVM runs, in the same left-to-right order), then one sqrt and one
    divide, so every output double is bit-equal to the expression path's
    (pinned by tests/test_sq8.py::test_unit_kernel_bit_identity)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _unit(a):
        X = np.array(a.tolist(), dtype=np.float64)
        if len(X) == 0:
            return pd.Series([], dtype=object)
        acc = np.zeros(len(X), dtype=np.float64)
        for i in range(X.shape[1]):          # the norm fold, dim-sequential
            acc = acc + X[:, i] * X[:, i]
        u = X / np.sqrt(acc)[:, None]
        return pd.Series(list(u))

    # real type objects, not stringified hints — `from __future__ import
    # annotations` turns inline hints into strings pyspark cannot resolve
    # against this module's globals (pd is factory-local)
    _unit.__annotations__ = {"a": pd.Series, "return": pd.Series}
    return pandas_udf(_unit, "array<double>")


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
