"""Similarity search over embedding columns (SURVEY.md §2b E3).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query set
against the corpus, scored with JVM higher-order functions, ranked with a
window. The broadcast means the corpus is never shuffled: at 100 TB the scan
streams once through the scorer.

Scale path: LSH bucketing via random hyperplane signatures (sign of dot with K
fixed pseudo-random hyperplanes — deterministic, seeded from the dimension
index, computed as expressions). Candidates = same bucket in any band; only
candidates get exact cosine. This bounds the scored pairs per query at the
cost of recall, the standard ANN trade.

Embedding near-dup (dedup-by-cosine) reuses the same scorer with a threshold
instead of a top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.vectors import as_double_array, cosine, dot, norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k per query vector: (query_id, vec_id, score_r, rank).

    Scores are rounded to 4dp BEFORE ranking (ties broken by vec_id) so the
    ranking is reproducible bit-for-bit across engines.
    """
    # norms are per-row, not per-pair: compute once on each side before the
    # join (cosine = dot/(norm_q·norm_c) — factoring is numerically identical,
    # and cuts per-pair flops to the dot product alone)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec")
    ).withColumn("qnorm", norm(F.col("qvec")))
    c = corpus.select(F.col(id_col), as_double_array(vec_col).alias("cvec")).withColumn(
        "cnorm", norm(F.col("cvec"))
    )
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        id_col,
        F.round(
            dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 4
        ).alias("score_r"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_r").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_r", "rank")
    )


def cosine_near_dup(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding near-duplicate pairs: probe × corpus cosine ≥ threshold,
    (id_a, id_b, score_r) with id_a < id_b. Probes broadcast."""
    p = probes.select(
        F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("avec")
    ).withColumn("anorm", norm(F.col("avec")))
    c = corpus.select(
        F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("bvec")
    ).withColumn("bnorm", norm(F.col("bvec")))
    return (
        c.join(F.broadcast(p), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("avec"), F.col("bvec")) / (F.col("anorm") * F.col("bnorm")), 4
            ).alias("score_r"),
        )
        .filter(F.col("score_r") >= threshold)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; engine-specific hashes → rows-only checked)


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: sin-hash of (seed, i) — fixed
    constants, no RNG state, reproducible across runs."""
    import math

    return [math.sin(seed * 10007 + i * 101) for i in range(dim)]


def _bucket_sig(v, dim: int, num_planes: int, seed: int):
    """BIGINT sign-bit signature Column over num_planes fixed hyperplanes."""
    sig = F.lit(0).cast("bigint")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, seed + p)])
        d = F.aggregate(F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bit = F.when(d > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = sig.bitwiseOR(F.shiftleft(bit, p))
    return sig


def _bucket_sig_norm_arrow(dim: int, num_planes: int, num_bands: int, seed: int):
    """Arrow kernel: vec → struct(buckets array<bigint>, vnorm double),
    BIT-IDENTICAL to ``[_bucket_sig(v, dim, num_planes, seed + 1000*b) for b
    in range(num_bands)]`` plus ``norm(v)``.

    r12 optimization (guide §4.1/§4.2): the expression path walks the vector
    through an interpreted (CodegenFallback) ``aggregate(zip_with(...))``
    fold once per plane — bands·planes·dim interpreted steps per row. The
    kernel preserves the fold's EXACT float semantics: for each dim j it
    does one IEEE multiply (x_j·p_j) and one IEEE add onto the running
    accumulator, vectorized across rows and planes but SEQUENTIAL across
    dims — the same left-to-right op sequence the JVM executes — so every
    dot product, every sign bit, and the norm are bit-equal to the
    expression path's (pinned by
    tests/test_similarity.py::test_bucket_sig_kernel_bit_identity). The
    same trick as vectors.unit_udf_factory; NOT the GEMM family hash
    (_banded_sigs_arrow), whose pairwise summation may flip near-zero
    signs."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplane(dim, seed + 1000 * b + p)
            for b in range(num_bands)
            for p in range(num_planes)
        ],
        dtype=np.float64,
    )  # (num_bands*num_planes, dim)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    def _k(vs: pandas.Series) -> pandas.DataFrame:
        X = np.array(vs.tolist(), dtype=np.float64)  # (n, dim)
        n = len(X)
        if n == 0:
            return pandas.DataFrame({"buckets": [], "vnorm": []}).astype(
                {"buckets": "object", "vnorm": "float64"}
            )
        acc = np.zeros((n, planes.shape[0]), dtype=np.float64)
        nsq = np.zeros(n, dtype=np.float64)
        for j in range(dim):  # the engine's fold: sequential over dims
            xj = X[:, j]
            acc = acc + xj[:, None] * planes[None, :, j]
            nsq = nsq + xj * xj
        bits = (acc > 0).astype(np.int64).reshape(n, num_bands, num_planes)
        sig = (bits * weights).sum(axis=2)  # disjoint bits == the bitwiseOR
        return pandas.DataFrame(
            {"buckets": list(map(list, sig)), "vnorm": np.sqrt(nsq)}
        )

    _k.__annotations__ = {"vs": pandas.Series, "return": pandas.DataFrame}
    return pandas_udf(_k, "buckets array<bigint>, vnorm double")


def cosine_near_dup_bucketed(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    dim: int = 64,
    num_planes: int = 8,
    num_bands: int = 4,
    seed: int = 7,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """FULL-CORPUS embedding near-dup without the probe×corpus nested loop:
    random-hyperplane buckets on BOTH sides, candidates = equi-join on
    (band, bucket), exact cosine refine in-bucket. (id_a, id_b, score_r),
    id_a < id_b, score_r ≥ threshold.

    This is the scale twin of ``cosine_near_dup`` (which broadcast-nested-loops
    a bounded probe set): here candidate generation is a hash shuffle on the
    bucket key — probes = corpus stays sub-quadratic. num_bands independent
    plane sets trade recall (a true pair is missed only if it splits in every
    band) against candidate volume; over-cap buckets degrade to star linking
    (see dedup._bucketed_pairs). Hash family is engine-specific → rows-only
    checked, like the other LSH paths.
    """
    from cassandra_data_migrator_spark.operators.dedup import _bucketed_pairs

    # r12 optimization (guide §4.2 + §2.4): one Arrow-kernel pass computes
    # every band signature AND the norm (bit-identical to the _bucket_sig /
    # norm expression forms — see _bucket_sig_norm_arrow), and the enriched
    # base is persisted because THREE consumers read it (band explode + both
    # refine sides): unpersisted, Catalyst re-evaluates the subtree per
    # branch. The table is |corpus| rows of (id, vec, 4 longs, 1 double) —
    # the same working set any LSH index materializes.
    kern = _bucket_sig_norm_arrow(dim, num_planes, num_bands, seed)
    base = (
        corpus.select(F.col(id_col), as_double_array(vec_col).alias("vec"))
        .withColumn("__k", kern(F.col("vec")))
        .select(
            id_col,
            "vec",
            F.col("__k.buckets").alias("__buckets"),
            F.col("__k.vnorm").alias("vnorm"),
        )
        .persist()
    )
    banded = base.select(
        F.col(id_col), F.posexplode("__buckets").alias("band", "bucket")
    )
    pairs = _bucketed_pairs(banded, id_col, ["band", "bucket"], max_bucket_size)
    # exact-cosine refine: join the vectors back onto the candidate ids only
    # (never carried through the pair generation/dedup)
    va = base.select(
        F.col(id_col).alias("id_a"), F.col("vec").alias("vec_a"), F.col("vnorm").alias("norm_a")
    )
    vb = base.select(
        F.col(id_col).alias("id_b"), F.col("vec").alias("vec_b"), F.col("vnorm").alias("norm_b")
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b")), 4
            ).alias("score_r"),
        )
        .filter(F.col("score_r") >= threshold)
    )


def assign_ivf_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: 'cells' = array of the nprobe nearest centroid ids
    (by cosine). Centroids are a small driver-side list (as in any IVF index —
    k-means output); distances are computed as expressions against literal
    arrays, so assignment is a codegen'd projection over the scan."""
    v = as_double_array(vec_col)
    scored = F.array(
        *[
            F.struct(
                (
                    F.aggregate(
                        F.zip_with(v, F.array(*[F.lit(x) for x in cvec]), lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    * F.lit(-1.0)
                ).alias("neg_dot"),
                F.lit(cid).alias("cell"),
            )
            for cid, cvec in centroids
        ]
    )
    # sort by (-dot, cell): nearest centroids first, deterministic ties
    cells = F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s.cell
    )
    return df.withColumn("cells", cells)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: corpus rows live in their nearest cell;
    each query probes its nprobe nearest cells; only same-cell pairs get exact
    cosine. The cell join is an equi-join — the corpus shuffles by cell once
    (or not at all if pre-partitioned by cell, the real IVF layout at rest)."""
    cb = (
        assign_ivf_cells(corpus, centroids, vec_col, nprobe=1)
        .select(
            F.col(id_col),
            F.explode(F.col("cells")).alias("cell"),
            as_double_array(vec_col).alias("cvec"),
        )
        .withColumn("cnorm", norm(F.col("cvec")))
    )
    qb = (
        assign_ivf_cells(queries, centroids, vec_col, nprobe=nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(F.col("cells")).alias("cell"),
            as_double_array(vec_col).alias("qvec"),
        )
        .withColumn("qnorm", norm(F.col("qvec")))
    )
    scored = (
        cb.join(F.broadcast(qb), ["cell"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 4
            ).alias("score_r"),
        )
        .distinct()  # a pair can meet in several probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_r").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_r", "rank")
    )


def _banded_sigs_arrow(dim: int, num_planes: int, num_bands: int, seed: int):
    """Arrow-vectorized band signatures: ONE numpy GEMM per record batch
    computes every (band, plane) dot product at once — (batch × dim) @
    (dim × bands·planes). The pure-expression path (_bucket_sig) walks the
    vector once per plane through INTERPRETED higher-order lambdas
    (Catalyst doesn't codegen them): at 8 bands × 8 planes that's 64
    traversals/row and measured 9.8 s at sf0.1 vs ~1 s for this kernel —
    the textbook case for dropping to a vectorized Pandas UDF. Same
    hyperplane family (sin-hash), deterministic."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    seeds = np.array(
        [seed + 1000 * b + p for b in range(num_bands) for p in range(num_planes)],
        dtype=np.float64,
    )
    idx = np.arange(dim, dtype=np.float64)
    planes = np.sin(seeds[:, None] * 10007 + idx[None, :] * 101)  # (bands·planes, dim)
    weights = (1 << np.arange(num_planes, dtype=np.int64))

    def _sigs(vs: pandas.Series) -> pandas.Series:
        mat = np.array(vs.tolist(), dtype=np.float64)  # (n, dim)
        bits = (mat @ planes.T > 0).astype(np.int64).reshape(len(mat), num_bands, num_planes)
        out = (bits * weights).sum(axis=2)  # (n, num_bands)
        return pandas.Series(list(map(list, out)))

    # NB: this module uses `from __future__ import annotations`, so the type
    # hints above are strings; resolve them to real types before pandas_udf
    # inspects the signature (it needs pandas.Series, not "pandas.Series").
    _sigs.__annotations__ = {"vs": pandas.Series, "return": pandas.Series}
    return pandas_udf(_sigs, "array<long>")


def lsh_topk_banded(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    num_planes: int = 8,
    num_bands: int = 8,
    seed: int = 7,
    probe_bits: int = 2,
) -> DataFrame:
    """Banded ANN top-k: candidates = same bucket in ANY of num_bands
    independent hyperplane sets (the standard recall lever — a true
    neighbor is missed only if it splits from the query in EVERY band).
    Candidate pairs are dedup'd before the exact-cosine refine so a pair
    matching in several bands scores once. Joins stay (band, bucket)
    equi-joins; candidate volume ≈ num_bands × corpus/2^num_planes per
    query. Signatures come from the Arrow GEMM kernel (_banded_sigs_arrow)
    — the one place dense-matrix math beats Catalyst expressions.

    Multi-probe (round-4 verdict #4): the QUERY side additionally probes
    each band bucket's Hamming-≤probe_bits neighbors (the classic
    multi-probe LSH move — a near neighbor that lands one or two sign-bits
    away is the dominant miss mode). probe_bits=2 fans each query band out
    to 1 + 8 + 28 = 37 probe buckets, on the broadcast (query) side ONLY;
    the corpus side still emits ONE row per band, so the big side's shuffle
    volume is unchanged and the join stays a (band, bucket) equi-join.
    Measured on the LSH-hostile near-uniform synthetic embeddings:
    aggregate recall 0.2-0.7 → 0.60-0.76, per-query min 0.0 → 0.4-0.6
    (see ann_recall_audit's floors). probe_bits=0 restores single-probe."""
    import itertools

    sigs = _banded_sigs_arrow(dim, num_planes, num_bands, seed)
    # Generalized flip masks: every Hamming-<=probe_bits neighbor of the
    # band bucket (a literal 1-bit/2-bit ladder previously capped silently
    # at 2 — round-5 review; probe_bits=3 now really probes 3-bit flips).
    masks = [0]
    for n_flips in range(1, probe_bits + 1):
        masks += [
            sum(1 << p for p in combo)
            for combo in itertools.combinations(range(num_planes), n_flips)
        ]

    def banded(df, out_id, probe=False):
        base = df.select(F.col(id_col).alias(out_id), as_double_array(vec_col).alias("v"))
        b = base.withColumn("sigs", sigs(F.col("v"))).select(
            out_id, "v", F.posexplode(F.col("sigs")).alias("band", "bucket")
        )
        if probe and len(masks) > 1:
            probes = F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            b = b.select(out_id, "v", "band", F.explode(probes).alias("bucket"))
        return b

    cb = banded(corpus, "cand_id")
    qb = banded(queries, "query_id", probe=True).withColumnRenamed("v", "qvec")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "qvec", "v")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand.select(
        "query_id",
        F.col("cand_id").alias(id_col),
        F.round(cosine(F.col("qvec"), F.col("v")), 4).alias("score_r"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_r").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_r", "rank")
    )


# NOTE: the single-probe `lsh_topk` (one plane set, no banding) was retired
# in round 7 — `lsh_topk_banded` strictly dominates it (same join shape,
# multi-band + multi-probe recall levers) and the banded variant carries the
# oracled recall audit. See COVERAGE.md "retired keys".
