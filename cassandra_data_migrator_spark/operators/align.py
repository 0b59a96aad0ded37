"""Per-key SEQUENCE alignment between two event streams — the ordered
sibling of the row-level DiffData validator (operators/validation.py):
row diffs say WHICH rows differ; alignment says how much each key's
ordered HISTORY drifted (CDC replay validation, session-integrity checks
after a migration cutover).

Spark-first shape: this is the repo's one `cogroup().applyInPandas`
operator — the canonical API for "merge two tables group-by-group with
per-group logic" (both sides arrive in ONE shuffle keyed by the group,
each group is handed to the kernel as two Arrow batches). The per-group
logic is genuinely non-relational: order-sensitive truncation, character
mapping, a Levenshtein DP (numpy row-vectorized) and Jaro-Winkler — the
similarity Spark has NO builtin for (Levenshtein alone would stay JVM on
F.levenshtein, the edit_distance_pairs discipline; it is computed here
too because the kernel already holds the sequences and the oracle checks
both). Jaro-Winkler semantics are fuzz-pinned identical to DuckDB's
jaro_winkler_similarity (4000 randomized pairs, byte-identical doubles;
the one divergence — two empty strings — adopts DuckDB's 0.0).

State is bounded: sequences are truncated to ``max_len`` BEFORE the DP
(the documented cap; full per-side counts are still reported), so a
degenerate hot key costs O(max_len²), never O(history²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

ALIGN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_src", IntegerType()),
        StructField("n_dst", IntegerType()),
        StructField("edit_distance", IntegerType()),
        StructField("jw_r", DoubleType()),
    ]
)


def _alignment_kernel(max_len: int):
    """Self-contained per-batch alignment kernel shared by both shapes:
    rows of (user_id, seq_a, seq_b, n_src, n_dst) → the output schema.
    numpy row-vectorized Levenshtein; Jaro-Winkler with DuckDB's
    conventions (see module docstring)."""

    def _batches(it):
        import math

        import numpy as np
        import pandas as pd

        def levenshtein(a: str, b: str) -> int:
            if not a:
                return len(b)
            if not b:
                return len(a)
            # Compare Unicode CODE POINTS (UTF-32-LE view), not latin-1
            # bytes: a char outside U+00FF would make .encode('latin1')
            # raise on the executor, while DuckDB's levenshtein() is
            # code-point based — code points keep both engines agreeing
            # for any text (len(str) == len of the uint32 view; no
            # surrogate pairs in UTF-32).
            bn = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
            idx = np.arange(len(b) + 1, dtype=np.int32)
            prev = idx.copy()
            for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)):
                cur = np.empty(len(b) + 1, dtype=np.int32)
                cur[0] = i + 1
                cur[1:] = np.minimum(prev[:-1] + (bn != ca), prev[1:] + 1)
                cur = np.minimum.accumulate(cur - idx) + idx
                prev = cur
            return int(prev[-1])

        def jaro(s1: str, s2: str) -> float:
            if not s1 or not s2:
                return 0.0
            md = max(len(s1), len(s2)) // 2 - 1
            if md < 0:
                md = 0
            f1 = [False] * len(s1)
            f2 = [False] * len(s2)
            m = 0
            for i, c in enumerate(s1):
                lo, hi = max(0, i - md), min(len(s2), i + md + 1)
                for j in range(lo, hi):
                    if not f2[j] and s2[j] == c:
                        f1[i] = f2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            j = 0
            for i in range(len(s1)):
                if f1[i]:
                    while not f2[j]:
                        j += 1
                    if s1[i] != s2[j]:
                        t += 1
                    j += 1
            t //= 2
            return (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0

        def jaro_winkler(s1: str, s2: str) -> float:
            jv = jaro(s1, s2)
            if jv > 0.7:
                l = 0
                for a, b in zip(s1[:4], s2[:4]):
                    if a == b:
                        l += 1
                    else:
                        break
                jv = jv + l * 0.1 * (1.0 - jv)
            return jv

        for pdf in it:
            out = {
                "user_id": [], "n_src": [], "n_dst": [],
                "edit_distance": [], "jw_r": [],
            }
            for uid, sa, sb, na, nb in zip(
                pdf["user_id"], pdf["seq_a"], pdf["seq_b"],
                pdf["n_src"], pdf["n_dst"],
            ):
                # missing full-outer sides arrive as None (object cols) or
                # NaN (pandas upcasts nullable ints to float64)
                a = ("" if pd.isna(sa) else str(sa))[:max_len]
                b = ("" if pd.isna(sb) else str(sb))[:max_len]
                out["user_id"].append(int(uid))
                out["n_src"].append(0 if pd.isna(na) else int(na))
                out["n_dst"].append(0 if pd.isna(nb) else int(nb))
                out["edit_distance"].append(levenshtein(a, b))
                # floor(x·10⁴ + 0.5)/10⁴, NOT Python round(): round() is
                # half-even, SQL ROUND is half-away — fuzz-pinned identical
                # to DuckDB's ROUND(double, 4)
                out["jw_r"].append(
                    math.floor(jaro_winkler(a, b) * 10000 + 0.5) / 10000
                )
            yield pd.DataFrame(out)

    return _batches


def sequence_align_diff(
    src: DataFrame,
    dst: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    max_len: int = 128,
) -> DataFrame:
    """(key, n_src, n_dst, edit_distance, jw_r) per key present on either
    side: each side's events are ordered by ``order_cols``, mapped to the
    first character of ``type_col``, truncated to ``max_len``, and
    aligned. jw_r is Jaro-Winkler similarity rounded to 4dp
    (DuckDB-identical); edit_distance is exact integer Levenshtein on the
    truncated sequences.

    HYBRID shape (the production path): the sequences are assembled
    JVM-side — sort_array(collect_list(struct(order, char))) per key,
    concat, truncate — and meet in one full-outer key join, so Python
    sees ONE row per key in large Arrow batches (one mapInPandas). The
    pure-cogroup variant below computes the identical answer but pays
    per-group pandas overhead on thousands of tiny groups — measured
    ~6.1 s isolated vs ~1 s for this shape on the sf0.1 fixture; pinned
    equal by tests."""
    o1, o2 = order_cols

    def _seqs(df: DataFrame, side: str) -> DataFrame:
        ordered = F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(o1),
                    F.col(o2),
                    F.substring(F.col(type_col), 1, 1).alias("__c"),
                )
            )
        )
        return df.groupBy(F.col(key_col).alias("user_id")).agg(
            F.substring(
                F.concat_ws(
                    "", F.transform(ordered, lambda s: s["__c"])
                ),
                1,
                max_len,
            ).alias(f"seq_{side}"),
            F.count(F.lit(1)).cast("int").alias(
                "n_src" if side == "a" else "n_dst"
            ),
        )

    joined = _seqs(src, "a").join(_seqs(dst, "b"), "user_id", "full_outer")
    return joined.mapInPandas(_alignment_kernel(max_len), ALIGN_SCHEMA)


def sequence_align_diff_cogrouped(
    src: DataFrame,
    dst: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    max_len: int = 128,
) -> DataFrame:
    """The same contract through ``cogroup().applyInPandas`` — the
    canonical two-sided grouped-kernel API, kept as a first-class variant
    (and the API-surface demonstration) with results pinned identical to
    the hybrid by tests. Prefer the hybrid for fleets of small groups;
    prefer THIS shape when per-group state is too large to assemble as a
    column (e.g. aligning full payload sequences, not char summaries)."""
    o1, o2 = order_cols
    cols = [key_col, o1, o2, type_col]

    def _align(left, right):
        import numpy as np
        import pandas as pd

        def seq(pdf):
            if len(pdf) == 0:
                return "", 0
            s = pdf.sort_values([o1, o2])[type_col].str[:1].str.cat()
            return s[:max_len], len(pdf)

        def levenshtein(a: str, b: str) -> int:
            if not a:
                return len(b)
            if not b:
                return len(a)
            # Compare Unicode CODE POINTS (UTF-32-LE view), not latin-1
            # bytes: a char outside U+00FF would make .encode('latin1')
            # raise on the executor, while DuckDB's levenshtein() is
            # code-point based — code points keep both engines agreeing
            # for any text (len(str) == len of the uint32 view; no
            # surrogate pairs in UTF-32).
            bn = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
            idx = np.arange(len(b) + 1, dtype=np.int32)
            prev = idx.copy()
            for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)):
                cur = np.empty(len(b) + 1, dtype=np.int32)
                cur[0] = i + 1
                # substitution/deletion candidates are row-parallel; the
                # insertion term cur[j-1]+1 is sequential, resolved by the
                # accumulate identity min_{k<=j}(c[k] + (j-k)) =
                # accumulate(c - idx) + idx — the standard vectorized-row
                # Levenshtein (O(len) numpy ops per row, no Python cell loop)
                cur[1:] = np.minimum(prev[:-1] + (bn != ca), prev[1:] + 1)
                cur = np.minimum.accumulate(cur - idx) + idx
                prev = cur
            return int(prev[-1])

        def jaro(s1: str, s2: str) -> float:
            if not s1 or not s2:
                return 0.0
            md = max(len(s1), len(s2)) // 2 - 1
            if md < 0:
                md = 0
            f1 = [False] * len(s1)
            f2 = [False] * len(s2)
            m = 0
            for i, c in enumerate(s1):
                lo, hi = max(0, i - md), min(len(s2), i + md + 1)
                for j in range(lo, hi):
                    if not f2[j] and s2[j] == c:
                        f1[i] = f2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            j = 0
            for i in range(len(s1)):
                if f1[i]:
                    while not f2[j]:
                        j += 1
                    if s1[i] != s2[j]:
                        t += 1
                    j += 1
            t //= 2
            return (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0

        def jaro_winkler(s1: str, s2: str) -> float:
            jv = jaro(s1, s2)
            if jv > 0.7:
                l = 0
                for a, b in zip(s1[:4], s2[:4]):
                    if a == b:
                        l += 1
                    else:
                        break
                jv = jv + l * 0.1 * (1.0 - jv)
            return jv

        a, na = seq(left)
        b, nb = seq(right)
        key = (
            left[key_col].iloc[0] if len(left) else right[key_col].iloc[0]
        )
        # floor(x·10⁴ + 0.5)/10⁴, NOT Python round(): round() is half-even,
        # SQL ROUND is half-away — fuzz-pinned identical to DuckDB's
        # ROUND(double, 4) on 20k randomized + dyadic-midpoint doubles
        import math

        jw4 = math.floor(jaro_winkler(a, b) * 10000 + 0.5) / 10000
        return pd.DataFrame(
            {
                "user_id": [key],
                "n_src": [na],
                "n_dst": [nb],
                "edit_distance": [levenshtein(a, b)],
                "jw_r": [jw4],
            }
        )

    return (
        src.select(*cols)
        .groupBy(key_col)
        .cogroup(dst.select(*cols).groupBy(key_col))
        .applyInPandas(_align, ALIGN_SCHEMA)
    )
