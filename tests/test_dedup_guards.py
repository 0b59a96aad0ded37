"""Pigeonhole-banding correctness + hot-bucket guards for the fuzzy-dedup
candidate generators.

The banding must be brute-force-equivalent exactly at hamming == max_hamming
(the boundary the pigeonhole argument guarantees), and a degenerate corpus —
every doc identical, one poison bucket — must yield a LINEAR number of
candidate pairs, not f(f−1)/2."""

import random

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.dedup import (
    dedup_fuzzy,
    hamming64,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_dup_pairs,
)


def _brute_force_pairs(spark, sigs, max_hamming):
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def test_pigeonhole_equals_brute_force_at_max_hamming(spark):
    """Adversarial pair: exactly max_hamming differing bits, one in each
    8-bit-wide chunk of the old uniform banding (which silently aliased the
    ninth chunk onto chunk 0 via the JVM's shift-mod-64, leaving only 8 real
    chunks — this pair was missed). floor-based boundaries keep ≥1 chunk
    clean, so the pair must be found."""
    adversarial = 0
    for pos in (0, 8, 16, 24, 32, 40, 48, 56):  # one bit per old chunk
        adversarial |= 1 << pos
    rng = random.Random(7)
    rows = [(1, 0), (2, adversarial)]
    # plus random background sigs (some close pairs, some far)
    base = rng.getrandbits(63)
    for i in range(3, 40):
        flips = rng.sample(range(64), rng.choice([2, 5, 8, 30]))
        v = base
        for f_ in flips:
            v ^= 1 << f_
        # keep values in signed-64 range the way simhash emits them
        if v >= 1 << 63:
            v -= 1 << 64
        rows.append((i, v))
    sigs = spark.createDataFrame(rows, "doc_id BIGINT, simhash BIGINT")

    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(sigs, max_hamming=8, num_chunks=9).collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in _brute_force_pairs(spark, sigs, max_hamming=8).collect()
    )
    assert (1, 2, 8) in want  # the adversarial pair really is at the boundary
    assert got == want


def test_simhash_hot_bucket_stays_linear(spark):
    """1k identical docs: every chunk bucket holds all 1000 docs. The star
    guard must emit exactly n−1 anchored pairs, not ~500k."""
    n = 1000
    sigs = spark.createDataFrame(
        [(i, 123456789) for i in range(1, n + 1)], "doc_id BIGINT, simhash BIGINT"
    )
    pairs = simhash_near_dup_pairs(sigs, max_hamming=3, num_chunks=4).collect()
    assert len(pairs) == n - 1
    assert all(r.id_a == 1 and r.hamming == 0 for r in pairs)
    assert {r.id_b for r in pairs} == set(range(2, n + 1))


def test_lsh_hot_bucket_stays_linear(spark):
    n = 1000
    docs = spark.createDataFrame(
        [(i, "the same document text repeated for everyone") for i in range(1, n + 1)],
        "doc_id BIGINT, text STRING",
    )
    out = dedup_fuzzy(docs, threshold=0.5)
    rows = out.collect()
    # linear star pairs, all exact duplicates -> est_jaccard 1.0
    assert len(rows) == n - 1
    assert all(r.id_a == 1 and r.est_jaccard == 1.0 for r in rows)


def test_uncapped_and_capped_agree_on_small_buckets(spark, sf_dir):
    """With no bucket over the cap, the guard is a no-op: capped output ==
    uncapped output on the real documents table."""
    from cassandra_data_migrator_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300)
    sigs = minhash_signatures(docs).persist()
    capped = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, max_bucket_size=256).collect()
    }
    uncapped = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, max_bucket_size=None).collect()
    }
    assert capped == uncapped


def test_incremental_pairs_never_self_pair(spark, sf_dir):
    """Batch-vs-corpus dedup must emit only cross-side pairs — no
    batch×batch or corpus×corpus pair can appear, and the join must stay a
    hash equi-join (no nested loop)."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.operators.dedup import incremental_jaccard_pairs
    from cassandra_data_migrator_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 7
    pairs = incremental_jaccard_pairs(
        d.filter(is_batch), d.filter(~is_batch), n=3, threshold=0.2
    )
    rows = pairs.collect()
    for r in rows:
        assert r.batch_id % 10 == 7, "left side must come from the batch"
        assert r.corpus_id % 10 != 7, "right side must come from the corpus"
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_pairs_match_all_pairs_restriction(spark, sf_dir):
    """Cross-side pairs == the all-pairs generator's output restricted to
    one-end-in-batch (same shingles, same exact Jaccard)."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.operators.dedup import (
        incremental_jaccard_pairs,
        ngram_jaccard_pairs,
    )
    from cassandra_data_migrator_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 7
    inc = {
        (r.batch_id, r.corpus_id, r.jaccard)
        for r in incremental_jaccard_pairs(
            d.filter(is_batch), d.filter(~is_batch), n=3, threshold=0.2
        ).collect()
    }
    full = ngram_jaccard_pairs(d, n=3, threshold=0.2).collect()
    expected = set()
    for r in full:
        a_b, b_b = r.id_a % 10 == 7, r.id_b % 10 == 7
        if a_b and not b_b:
            expected.add((r.id_a, r.id_b, r.jaccard))
        elif b_b and not a_b:
            expected.add((r.id_b, r.id_a, r.jaccard))
    assert inc == expected


def test_cap_shingle_df_removes_hot_shingles_only(spark):
    """cap_shingle_df: shingles over the cap vanish, everything else
    survives untouched, and the pair set computed from the capped index
    loses exactly the pairs whose overlap was boilerplate-only."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.operators import dedup

    # boilerplate shingle 'bp' in every doc; 'ab' shared by docs 1+2 only
    rows = [
        (1, [("bp",), ("ab",)]),
        (2, [("bp",), ("ab",)]),
        (3, [("bp",), ("xx",)]),
        (4, [("bp",), ("yy",)]),
    ]
    data = [(i, s[0]) for i, sh in rows for s in sh]
    idx = spark.createDataFrame(data, "doc_id BIGINT, shingle STRING")
    capped = dedup.cap_shingle_df(idx, max_df=3)
    kept = {(r["doc_id"], r["shingle"]) for r in capped.collect()}
    assert all(s != "bp" for _, s in kept), "hot shingle survived the cap"
    assert {(1, "ab"), (2, "ab"), (3, "xx"), (4, "yy")} == kept
    # plan: the filter is a broadcast anti-join, never an index shuffle
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        capped.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin LeftAnti" in p or (
        "LeftAnti" in p and "Broadcast" in p
    )


def test_prefix_filter_matches_full_inverted_index(spark):
    """The prefix-filtered set-similarity join is EXACT (All-Pairs lemma):
    on a randomized corpus with planted near-dups it must return the
    identical (id_a, id_b, jaccard) set as ngram_jaccard_pairs, whose
    candidates come from the FULL inverted index. Run at two thresholds so
    both prefix lengths (n/2-ish and n/5-ish) are exercised."""
    from cassandra_data_migrator_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for doc_id in range(30):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(8, 30))]
        rows.append((doc_id, " ".join(words)))
        if doc_id % 5 == 0:  # planted near-dup: one word appended
            # (k shared shingles of k+1 -> J = k/(k+1) >= 6/7, above both
            # tested thresholds even for the shortest 8-word docs)
            rows.append((doc_id + 1000, " ".join(words + ["zz"])))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for t in (0.5, 0.8):
        full = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(df, n=3, threshold=t).collect()
        }
        pref = {
            (r.id_a, r.id_b, r.jaccard)
            for r in prefix_filter_jaccard_pairs(df, n=3, threshold=t).collect()
        }
        assert pref == full, (t, pref ^ full)
        assert full, f"fixture produced no pairs at t={t} (vacuous test)"


def test_prefix_filter_threshold_boundary(spark):
    """A pair landing EXACTLY at the threshold must survive: J = 0.5 via
    two 6-shingle sets sharing exactly 4 shingles (4/8 = 0.5). Also pins
    the rounding guard: the relaxed prefix (t' = t − 0.001) still
    generates the boundary pair."""
    from cassandra_data_migrator_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    # 8 tokens -> 6 3-shingles each; docs share tokens 1..6 -> 4 shared
    # 3-shingles; J = 4 / (6 + 6 - 4) = 0.5 exactly
    a = "a1 c1 c2 c3 c4 c5 c6 a2"
    b = "b1 c1 c2 c3 c4 c5 c6 b2"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id LONG, text STRING")
    got = prefix_filter_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(1, 2, 0.5)]


def test_ngram_base_threshold_covers_every_consumer():
    """r12: the scored ngram-pair session artifact is built ONCE at
    NGRAM_BASE_THRESHOLD and every consumer filters it at its own
    threshold — sound only while the base sits at or below the lowest
    consumer threshold (a pair below the base never materializes, so a
    consumer filtering below it would silently lose pairs)."""
    from cassandra_data_migrator_spark.queries.dedup_text import (
        NGRAM_BASE_THRESHOLD,
        NGRAM_THRESHOLD,
    )
    from cassandra_data_migrator_spark.queries.multimodal_keys import (
        SWEEP_THRESHOLDS,
    )
    from cassandra_data_migrator_spark.queries.sql_frontend import (
        MINHASH_AUDIT_THRESHOLD,
    )

    assert NGRAM_BASE_THRESHOLD <= NGRAM_THRESHOLD
    assert NGRAM_BASE_THRESHOLD <= MINHASH_AUDIT_THRESHOLD
    assert NGRAM_BASE_THRESHOLD <= min(SWEEP_THRESHOLDS)
