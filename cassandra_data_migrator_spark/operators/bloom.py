"""Bloom-filter prefilter for PK validation — the runtime-filter pattern.

At 100 TB the expensive step of DiffData-style validation
(operators/validation.py; CDM DiffJobSession [upstream@6.0.1]) is the
co-partitioned PK join itself: both tables shuffle on the key. Spark's own
optimizer injects bloom filters for exactly this shape (InjectRuntimeFilter:
build a bloom over the small/filtered side, broadcast it, and drop probe-side
rows before the shuffle). This module reproduces that pattern as an explicit,
auditable operator for the migration-validation use case:

1. **Build** (distributed): every target PK hashes to ``k`` bit positions
   (``xxhash64`` with per-hash seeds — JVM, codegen'd); positions pack into
   64-bit words via a ``bit_or`` aggregate on the word index. The aggregate
   output is at most ``m / 64`` rows regardless of input size — partial
   (map-side) combine does the heavy lifting, and only packed words cross
   the wire. The collected word array (``m / 64`` longs, e.g. 512 KiB for
   m = 2^22) is the SAME driver-bounded artifact Spark's runtime filter
   broadcasts; SCALE.md ground rule 1 (bounded-by-construction collect).
2. **Probe** (distributed, zero shuffle): membership is a pure JVM
   expression over a single array literal — ``element_at`` on the word for
   each of the k positions, bit-test, AND. No join, no Python; the probe
   side streams through its scan.

Semantics (the classic bloom contract): a key present in the build side is
ALWAYS reported "maybe present" (no false negatives), so probe-side keys the
filter rejects are **definitely missing** from the target — a migration
validator catches them without ever running the diff join. A small
false-positive fraction of truly-missing keys slips through to the join
stage (caught there; correctness unaffected). ``bloom_prefilter_audit``
pins both halves of that contract under the driver's value check.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_NUM_HASHES = 5
BLOOM_BITS_PER_KEY = 20  # fp ~= (1 - e^(-k/20))^k ~= 0.0022 at k=5


def _positions(key: Column, m: int, k: int) -> list[Column]:
    """The k bit positions of ``key`` in an m-bit filter (m a power of 2).

    Seeded xxhash64 per hash function — the same JVM hash family the
    engine's MinHash/SimHash paths use, so cross-partition determinism is
    already contract-tested there."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)).cast("bigint")
        for i in range(k)
    ]


def sized_bits(n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    """Filter size for ``n_keys``: next power of two >= n * bits_per_key
    (power of two keeps pmod/bit arithmetic shift-friendly), floor 2^10."""
    return 1 << max(10, math.ceil(math.log2(max(1, n_keys) * bits_per_key)))


def build_bloom(df: DataFrame, key_col: str, m: int, k: int = BLOOM_NUM_HASHES) -> list[int]:
    """Distributed build → packed word array (length m/64, python ints).

    One explode + one groupBy(word_idx) with map-side partial bit_or: the
    shuffle carries <= m/64 rows of (idx, word) per map partition, never
    keys. Missing words (no key hashed into them) fill with 0."""
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m, k))).alias("pos")
    words = (
        df.select(pos)
        # call_function: the SQL shiftleft/shiftright accept a COLUMN bit
        # count (the python wrappers' numBits is typed int-only)
        .select(
            F.call_function("shiftright", F.col("pos"), F.lit(6)).cast("bigint").alias("widx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    packed = [0] * (m // 64)
    for r in words:
        packed[int(r["widx"])] = int(r["word"])
    return packed


def bloom_frame(spark, packed: list[int]) -> DataFrame:
    """The packed filter as a ONE-ROW DataFrame carrying the word array.

    The filter must reach executors as DATA (a broadcast row), never as an
    expression: pyspark's ``F.lit(list)`` expands to a CreateArray with
    m/64 child literal nodes, and at m = 2^22 the 65k-child expression
    tree (x k probes) costs tens of seconds of analysis/codegen before a
    single row flows (measured 38 s on the sf0.1 audit). A broadcast
    1-row crossJoin is how Spark's own InjectRuntimeFilter ships bloom
    bits (a subquery result, not a literal) — same shape here."""
    return spark.createDataFrame([(packed,)], "__bloom_words ARRAY<BIGINT>")


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    packed: list[int],
    m: int,
    k: int = BLOOM_NUM_HASHES,
    flag_col: str = "flagged",
    negate: bool = True,
) -> DataFrame:
    """Attach the membership verdict to every row of ``df`` via the
    broadcast 1-row word array (pinned BNLJ 'total' class). With
    ``negate`` (default) the flag means DEFINITELY-ABSENT — the
    prefilter's actionable signal."""
    spark = df.sparkSession
    out = df.crossJoin(F.broadcast(bloom_frame(spark, packed)))
    hit = might_contain(F.col(key_col), F.col("__bloom_words"), m, k)
    return out.withColumn(flag_col, ~hit if negate else hit).drop("__bloom_words")


def might_contain(key: Column, words: Column, m: int, k: int = BLOOM_NUM_HASHES) -> Column:
    """JVM membership expression against the broadcast word-array COLUMN
    (from ``bloom_frame`` — see there for why a column, not a literal).
    Each of the k probes is element_at + shift + mask; NULL keys return
    false (a NULL PK is never 'present')."""
    tests = []
    for p in _positions(key, m, k):
        word = F.element_at(
            words, (F.call_function("shiftright", p, F.lit(6)) + 1).cast("int")
        )
        tests.append(
            F.call_function("shiftright", word, (p % 64).cast("int"))
            .bitwiseAND(F.lit(1))
            == 1
        )
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return F.when(key.isNull(), F.lit(False)).otherwise(out)


def prefilter_missing(
    origin: DataFrame, target: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """Definitely-missing PK report — the bloom tier of the validation
    ladder (plans/migrate.run_validate tier='prefilter').

    Composite PKs collapse to one ``xxhash64(*pk)`` key on BOTH sides
    before the filter; a hash collision can only turn a missing key into
    'maybe present' (a missed catch — the safe direction), never invent a
    missing row, so the output contract matches the bloom's: every
    reported row IS missing from the target (status column matches the
    diff report's vocabulary), some missing rows may go unreported
    (caught by a later full/sampled tier). Probe side never shuffles."""
    keyed = [F.col(c) for c in pk_cols]
    tgt = target.select(F.xxhash64(*keyed).alias("__bk"))
    m = sized_bits(tgt.count())
    packed = build_bloom(tgt, "__bk", m)
    probe = origin.select(*pk_cols, F.xxhash64(*keyed).alias("__bk"))
    return (
        with_bloom_flag(probe, "__bk", packed, m)
        .filter("flagged")
        .select(*pk_cols)
        .withColumn("status", F.lit("missing"))
    )


def bloom_prefilter_audit(
    origin: DataFrame,
    target: DataFrame,
    pk_col: str,
    min_catch_rate: float = 0.9,
) -> DataFrame:
    """One-row audit of the bloom prefilter against exact truth.

    Build over ``target``'s PKs, probe every ``origin`` PK; compare the
    definitely-missing set against the exact missing set (left anti join —
    computed here only to audit; production replaces it with the diff join
    on the filter's survivors). Emits:

    - ``n_origin`` / ``n_missing_exact`` — exact counts (oracle recomputes),
    - ``flagged_subset_ok`` — every bloom-flagged key IS truly missing
      (the no-false-negative contract: a present key can never fail all k
      bit tests unless the packing is broken),
    - ``catch_rate_ok`` — the filter catches >= ``min_catch_rate`` of the
      truly-missing keys without any join (expected miss fraction == the
      fp rate, ~0.2% at 20 bits/key).

    The exact branch shuffles; the bloom branch does not — that asymmetry
    is the 100 TB point, and the audit emits only exact counts + booleans
    so the DuckDB oracle is engine-independent.
    """
    n_target = target.count()
    m = sized_bits(n_target)
    packed = build_bloom(target, pk_col, m)
    key = F.col(pk_col)
    probed = with_bloom_flag(
        origin.select(key.alias("pk")), "pk", packed, m, flag_col="flagged"
    )
    exact_missing = (
        origin.select(key.alias("pk"))
        .join(target.select(key.alias("pk")).distinct(), "pk", "left_anti")
        # distinct so a duplicate-PK origin cannot multiply rows through
        # the left join below — each probed row picks up at most one
        # __miss marker, keeping n_origin == count(origin) by construction
        .distinct()
        .select("pk", F.lit(1).alias("__miss"))
    )
    joined = probed.join(exact_missing, "pk", "left")
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_origin"),
        F.sum(F.coalesce(F.col("__miss"), F.lit(0))).cast("bigint").alias("n_missing_exact"),
        (
            F.sum(F.when(F.col("flagged") & F.col("__miss").isNull(), 1).otherwise(0)) == 0
        ).alias("flagged_subset_ok"),
        (
            F.sum(F.when(F.col("flagged") & F.col("__miss").isNotNull(), 1).otherwise(0))
            >= F.lit(min_catch_rate) * F.sum(F.coalesce(F.col("__miss"), F.lit(0)))
        ).alias("catch_rate_ok"),
    )


def bloom_corpus_dedup_audit(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_corpus: int | None = None,
) -> DataFrame:
    """One-row audit of INCREMENTAL content dedup against a standing
    corpus — the daily-ingest shape at 100 TB: the new batch must be
    deduplicated against an arbitrarily large corpus WITHOUT joining the
    batch to it row-by-row. A bloom over the corpus's content hashes
    routes each batch doc:

    - definitely-new (no bit match): skips the verify join entirely —
      EXACT by the no-false-negative law; at a real fp rate (~0.2% at 20
      bits/key) this is almost the whole non-duplicate batch;
    - candidate (all bits match): verified by ONE equi-join of the
      candidate SUBSET against the corpus hash column — the corpus is
      scanned (hash column only), never shuffled against the batch, and
      the candidate side is |true dups| + fp-rate·|batch|.

    Emits exact counts plus contract booleans (the bloom_prefilter_audit
    discipline — bit positions are engine-specific, so the oracle pins
    exact counts and expects the booleans true):

    - ``n_batch`` / ``n_dup_exact`` — oracle recomputes both;
    - ``prefilter_subset_ok`` — no definitely-new doc is a true dup
      (a false negative would silently re-ingest nothing — it would
      DUPLICATE corpus content);
    - ``verify_exact_ok`` — candidates verified by the equi-join
      reproduce the exact duplicate set.

    An EMPTY batch trivially satisfies both contracts (the booleans
    coalesce to true over zero rows, never NULL). Pass ``n_corpus`` when
    the standing corpus's size is already known (a real pipeline tracks
    it) to skip the sizing count — the audit then scans the corpus twice
    (bloom build + verify side), not three times; the one hash projection
    feeds both.
    """
    key_batch = F.md5(F.col(text_col).cast("binary"))
    corpus_h = corpus.select(F.md5(F.col(text_col).cast("binary")).alias("__h"))
    if n_corpus is None:
        n_corpus = corpus.count()
    m = sized_bits(n_corpus)
    packed = build_bloom(corpus_h, "__h", m)
    probed = with_bloom_flag(
        batch.select(F.col(id_col).alias("__id"), key_batch.alias("__h")),
        "__h",
        packed,
        m,
        flag_col="definitely_new",
    )
    corpus_hashes = corpus_h.distinct().select(
        "__h", F.lit(1).alias("__in_corpus")
    )
    # candidates only enter the verify join; definitely-new rows carry a
    # NULL verify outcome by construction
    verified = probed.join(
        corpus_hashes,
        (probed["__h"] == corpus_hashes["__h"]) & ~probed["definitely_new"],
        "left",
    ).select(probed["__id"], probed["__h"], "definitely_new", "__in_corpus")
    exact = batch.select(
        F.col(id_col).alias("__id2"), key_batch.alias("__h2")
    ).join(
        corpus_hashes.select(F.col("__h").alias("__h2"), F.lit(1).alias("__dup")),
        "__h2",
        "left",
    ).select("__id2", "__dup")
    joined = verified.join(exact, verified["__id"] == exact["__id2"], "inner")
    # SUM over zero rows is NULL — coalesce every aggregate so an empty
    # batch reports (0, 0, true, true) instead of NULLs (review r08)
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch"),
        F.coalesce(F.sum(F.coalesce(F.col("__dup"), F.lit(0))), F.lit(0))
        .cast("bigint")
        .alias("n_dup_exact"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("definitely_new") & F.col("__dup").isNotNull(), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            == 0
        ).alias("prefilter_subset_ok"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        (F.coalesce(F.col("__in_corpus"), F.lit(0)) == 1)
                        != F.col("__dup").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            == 0
        ).alias("verify_exact_ok"),
    )


def bloom_corpus_dedup_keep(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_corpus: int | None = None,
) -> DataFrame:
    """Row-level routing twin of :func:`bloom_corpus_dedup_audit`: return
    the batch rows whose content does NOT already exist in the standing
    corpus — the stage a nightly curation pipeline actually chains on.

    Exact by construction: definitely-new rows (no bloom bit match) skip
    the verify join entirely under the no-false-negative law; candidate
    rows are confirmed by ONE equi-join of the candidate SLIVER against
    the corpus hash column. The survivor set is therefore row-identical
    to an md5 anti-join — the bloom changes only COST (the corpus never
    joins the full batch), which is what keeps the shape viable when the
    standing corpus is 100 TB and the batch is a day of crawl."""
    key_batch = F.md5(F.col(text_col).cast("binary"))
    corpus_h = corpus.select(F.md5(F.col(text_col).cast("binary")).alias("__h"))
    if n_corpus is None:
        n_corpus = corpus.count()
    m = sized_bits(n_corpus)
    packed = build_bloom(corpus_h, "__h", m)
    probed = with_bloom_flag(
        batch.withColumn("__h", key_batch), "__h", packed, m,
        flag_col="__dnew",
    )
    survivors_new = probed.filter(F.col("__dnew"))
    survivors_cand = (
        probed.filter(~F.col("__dnew"))
        .join(
            corpus_h.distinct().withColumn("__dup", F.lit(1)),
            "__h",
            "left",
        )
        .filter(F.col("__dup").isNull())
        .drop("__dup")
    )
    return survivors_new.unionByName(survivors_cand).drop("__h", "__dnew")
