"""Property-based tests (hypothesis) for the pure-function layer.

These pin algebraic invariants the oracle-parity suite can't see: the token
ring's bijectivity/range, codec round-trips, CQL duration parse/format
inverses, and hamming/pigeonhole guarantees — each checked over generated
inputs, driver-side through one small Spark job per case batch."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions import codecs
from cassandra_data_migrator_spark.functions.tokens import (
    TOKEN_MAX,
    TOKEN_MIN,
    slice_bounds,
    slice_id,
    tok,
)

KEYS = st.integers(min_value=0, max_value=10_000_000)


@settings(max_examples=20, deadline=None)
@given(st.lists(KEYS, min_size=1, max_size=50, unique=True))
def test_token_ring_range_and_determinism(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    out = df.select(tok("k").alias("t"), slice_id(tok("k"), 32).alias("s")).collect()
    for r in out:
        assert TOKEN_MIN <= r["t"] <= TOKEN_MAX
        assert 0 <= r["s"] < 32
    # pure function of the key: a second evaluation is identical
    again = df.select(tok("k").alias("t")).collect()
    assert [r["t"] for r in out] == [r["t"] for r in again]


def test_slice_bounds_partition_the_ring():
    bounds = slice_bounds(32)
    assert bounds[0][1] == TOKEN_MIN and bounds[-1][2] == TOKEN_MAX
    for (_, _, hi), (_, lo2, _) in zip(bounds, bounds[1:]):
        assert lo2 == hi + 1


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=30))
def test_bigint_string_roundtrip(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x BIGINT")
    out = df.select(
        codecs.string_to_bigint(codecs.int_to_string(F.col("x"))).alias("y"), "x"
    ).collect()
    assert all(r["y"] == r["x"] for r in out)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=120),  # months
            st.integers(min_value=0, max_value=1000),  # days
            st.integers(min_value=0, max_value=10**12),  # nanos
        ),
        min_size=1,
        max_size=20,
    )
)
def test_cql_duration_format_parse_roundtrip(spark, durs):
    strs = [f"{m}mo{d}d{n}ns" for m, d, n in durs]
    df = spark.createDataFrame([(s,) for s in strs], "s STRING")
    out = df.select(
        codecs.cql_duration_format(codecs.cql_duration_parse(F.col("s"))).alias("r"), "s"
    ).collect()
    parsed = df.select(codecs.cql_duration_parse(F.col("s")).alias("p")).collect()
    # format∘parse must re-parse to the same struct (canonical form round-trip)
    df2 = spark.createDataFrame([(r["r"],) for r in out], "s STRING")
    reparsed = df2.select(codecs.cql_duration_parse(F.col("s")).alias("p")).collect()
    assert [r["p"] for r in parsed] == [r["p"] for r in reparsed]


WORDS = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("Ll", "Lu", "Nd"), include_characters="é✓"
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(WORDS, min_size=1, max_size=12), min_size=1, max_size=8
    )
)
def test_bpe_pipeline_matches_reference_on_random_corpora(spark, docs):
    """The distributed BPE count (explode → distinct-word Arrow kernel →
    broadcast join → per-doc sum) must equal a pure-Python per-doc
    recomputation on arbitrary unicode corpora — including repeated chars,
    single-char words, and non-ASCII."""
    from cassandra_data_migrator_spark.functions import bpe

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    merges = bpe.train_bpe(df, num_merges=12, max_word_types=1_000)
    got = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_counts(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, ws in enumerate(docs):
        # mirror tokens(): lowercase + whitespace split, empties dropped
        toks = [w for w in " ".join(ws).lower().split() if w]
        want = sum(len(bpe.apply_bpe_word(w, ranks)) for w in toks)
        assert got.get(i, 0) == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(WORDS, min_size=1, max_size=10), min_size=1, max_size=6))
def test_bpe_merges_shrink_token_counts_monotonically(spark, docs):
    """Invariant: more merges can never INCREASE any doc's token count, and
    0 merges counts chars+1 per word exactly."""
    from cassandra_data_migrator_spark.functions import bpe

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    merges = bpe.train_bpe(df, num_merges=10, max_word_types=1_000)
    ranks_all = {p: i for i, p in enumerate(merges)}
    for i, ws in enumerate(docs):
        toks = [w for w in " ".join(ws).lower().split() if w]
        prev = None
        for k in (0, len(merges) // 2, len(merges)):
            ranks = {p: r for p, r in ranks_all.items() if r < k}
            n = sum(len(bpe.apply_bpe_word(w, ranks)) for w in toks)
            if k == 0:
                assert n == sum(len(w) + 1 for w in toks)
            if prev is not None:
                assert n <= prev
            prev = n


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=0, max_value=100_000),  # ts_us
            st.booleans(),  # left (anchor) vs right (payload)
        ),
        min_size=2,
        max_size=24,
    )
)
def test_interval_join_matches_brute_force(spark, rows):
    """The bucketized interval join must equal the brute-force quadratic
    reference on arbitrary key/time layouts — including duplicate
    timestamps, bucket-boundary events, and empty sides."""
    from cassandra_data_migrator_spark.operators.interval import interval_join_bucketed

    window = 1_000
    left = [(i, k, t) for i, (k, t, is_l) in enumerate(rows) if is_l]
    right = [(k, t, float(i)) for i, (k, t, is_l) in enumerate(rows) if not is_l]
    ldf = spark.createDataFrame(
        left or [(0, 0, 0)], "event_id BIGINT, user_id BIGINT, ts_us BIGINT"
    )
    rdf = spark.createDataFrame(
        right or [(0, 0, 0.0)], "user_id BIGINT, ts_us BIGINT, value DOUBLE"
    )
    if not left:
        ldf = ldf.filter("event_id < 0")
    if not right:
        rdf = rdf.filter("value < 0")
    got = sorted(
        (r.event_id, r.rv_ts, r.rv_value)
        for r in interval_join_bucketed(
            ldf, rdf, ["user_id"], "ts_us", "ts_us", window, ["value"]
        ).collect()
    )
    want = sorted(
        (eid, rt, rv)
        for (eid, lk, lt) in left
        for (rk, rt, rv) in right
        if lk == rk and lt < rt <= lt + window
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=50),  # ts
            st.booleans(),  # left vs right
        ),
        min_size=2,
        max_size=20,
    )
)
def test_asof_join_matches_brute_force(spark, rows):
    """The union+window as-of join must equal the quadratic reference
    (latest right row with ts <= left ts, ties by largest tiebreak) on
    arbitrary layouts — duplicate timestamps and ts-equal left/right rows
    included."""
    from cassandra_data_migrator_spark.operators.asof import asof_join

    left = [(i, k, t) for i, (k, t, is_l) in enumerate(rows) if is_l]
    right = [(i, k, t, float(i)) for i, (k, t, is_l) in enumerate(rows) if not is_l]
    ldf = spark.createDataFrame(
        left or [(0, 0, 0)], "lid BIGINT, user_id BIGINT, ts_us BIGINT"
    )
    rdf = spark.createDataFrame(
        right or [(0, 0, 0, 0.0)],
        "rid BIGINT, user_id BIGINT, ts_us BIGINT, value DOUBLE",
    )
    if not left:
        ldf = ldf.filter("lid < 0")
    if not right:
        rdf = rdf.filter("rid < 0")
    got = sorted(
        (r.lid, r.rv_ts, r.rv_value)
        for r in asof_join(
            ldf, rdf, ["user_id"], "ts_us", ["value"], how="inner", tiebreak_col="rid"
        ).collect()
    )
    want = []
    for lid, lk, lt in left:
        cands = [(rt, rid, rv) for (rid, rk, rt, rv) in right if rk == lk and rt <= lt]
        if cands:
            rt, rid, rv = max(cands)  # latest ts, then largest tiebreak id
            want.append((lid, rt, rv))
    assert got == sorted(want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=0,
        max_size=18,
    )
)
def test_dedup_clusters_match_union_find(spark, raw_pairs):
    """Min-label propagation + pointer jumping must assign exactly the
    union-find components (cluster id = min node id of the component) on
    arbitrary random graphs — chains, cliques, self-loops, isolated
    nodes."""
    from cassandra_data_migrator_spark.operators.dedup import dedup_clusters

    pairs = [(a, b) for a, b in raw_pairs if a != b]
    node_ids = sorted({n for p in pairs for n in p} | {0, 1})
    ids = spark.createDataFrame([(n,) for n in node_ids], "doc_id BIGINT")
    pdf = spark.createDataFrame(
        pairs or [(0, 1)], "id_a BIGINT, id_b BIGINT"
    )
    if not pairs:
        pdf = pdf.filter("id_a < 0")
    got = {
        r.doc_id: r.cluster_id for r in dedup_clusters(ids, pdf).collect()
    }
    # union-find reference
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    comp_min = {}
    for n in node_ids:
        r = find(n)
        comp_min.setdefault(r, []).append(n)
    for members in comp_min.values():
        m = min(members)
        for n in members:
            want[n] = m
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]),
            min_size=3,
            max_size=10,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_incremental_jaccard_matches_set_reference(spark, docs):
    """Batch-vs-corpus Jaccard must equal a pure-Python shingle-set
    reference on random small-vocab corpora (high duplicate density by
    construction)."""
    from cassandra_data_migrator_spark.operators.dedup import incremental_jaccard_pairs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    is_batch = [i for i, _ in rows if i % 2 == 0]
    batch = df.filter(F.col("doc_id") % 2 == 0)
    corpus = df.filter(F.col("doc_id") % 2 == 1)
    got = {
        (r.batch_id, r.corpus_id): r.jaccard
        for r in incremental_jaccard_pairs(
            batch, corpus, n=2, threshold=0.3
        ).collect()
    }

    def shingles(ws):
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    want = {}
    for i, wi in enumerate(docs):
        if i % 2 != 0:
            continue
        si = shingles([w.lower() for w in wi])
        for j, wj in enumerate(docs):
            if j % 2 != 1 or not si:
                continue
            sj = shingles([w.lower() for w in wj])
            inter = len(si & sj)
            if inter == 0 or not sj:
                continue
            jac = round(inter / (len(si) + len(sj) - inter), 4)
            if jac >= 0.3:
                want[(i, j)] = jac
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 50)),
        min_size=1, max_size=120,
    ),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=6),
)
def test_top_k_rows_matches_full_row_number(spark, rows, k, nparts):
    """operators/rank.top_k_rows (round-5 verdict #1): for ANY input
    partitioning, the two-phase top-k must be bit-identical to
    row_number() over the full input — including duplicate order values
    (the id tiebreak) and k larger than the input."""
    from pyspark.sql import Window

    from cassandra_data_migrator_spark.operators.rank import top_k_rows

    ids = {i: (i, v) for i, (_, v) in enumerate(rows)}  # unique id per row
    data = [(i, v) for i, (_, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id BIGINT, v BIGINT").repartition(nparts)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        (r.id, r.rnk)
        for r in top_k_rows(df, k, order, rank_col="rnk").collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r.id, r.rnk)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.binary(min_size=0, max_size=200),
    st.sampled_from([b" ", b"\n", b"\t", b"\r"]),
    st.booleans(),
)
def test_decode_ppm_roundtrip_any_pixels(w, h, extra, sep, comment):
    """decode_ppm: for ANY pixel bytes (including bytes that look like
    whitespace or '#'), a well-formed header round-trips exactly, and any
    truncation/padding of the pixel section is rejected."""
    import pytest as _pytest

    from cassandra_data_migrator_spark.operators.multimodal import decode_ppm

    n = w * h * 3
    pixels = (extra * ((n // max(len(extra), 1)) + 2))[:n] if extra else bytes(n)
    head = b"P6" + sep
    if comment:
        head += b"# generated\n"
    head += str(w).encode() + b" " + str(h).encode() + sep + b"255\n"
    payload = head + pixels
    got = decode_ppm(payload)
    assert got == (w, h, 255, pixels)
    if n > 0:
        with _pytest.raises(ValueError):
            decode_ppm(payload[:-1])
    with _pytest.raises(ValueError):
        decode_ppm(payload + b"\x00")


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64),
    st.sampled_from([8, 16]),
    st.integers(min_value=1, max_value=192_000),
    st.booleans(),
)
def test_decode_wav_roundtrip_random_clips(samples, bits, rate, junk_chunk):
    """decode_wav: any PCM clip (either bit depth, any sample rate, with or
    without an odd-sized unknown chunk before data) round-trips exactly,
    and truncating the data section by one byte is always rejected."""
    import pytest as _pytest

    from cassandra_data_migrator_spark.operators.multimodal import decode_wav

    if bits == 8:
        samples = [s & 0xFF for s in samples]
        data = bytes(samples)
    else:
        data = b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * bits // 8).to_bytes(4, "little")
        + (bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if junk_chunk:
        chunks += b"JUNK" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    payload = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    ch, got_rate, got_bits, got_data = decode_wav(payload)
    assert (ch, got_rate, got_bits, got_data) == (1, rate, bits, data)
    if data:
        with _pytest.raises(ValueError):
            decode_wav(payload[:-1])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.lists(
        st.lists(st.integers(min_value=0, max_value=255), min_size=25, max_size=25),
        min_size=1,
        max_size=6,
    ),
    st.booleans(),
    st.booleans(),
)
def test_decode_y4m_roundtrip_random_clips(w, h, raw_frames, extra_params, frame_params):
    """decode_y4m: any mono clip (any W/H up to 5, 1-6 frames, with or
    without unknown stream/FRAME parameters) round-trips exactly, and
    truncating the last frame by one byte is always rejected."""
    import pytest as _pytest

    from cassandra_data_migrator_spark.operators.multimodal import decode_y4m

    frames = [bytes(f[: w * h]) for f in raw_frames]
    head = f"YUV4MPEG2 W{w} H{h}"
    if extra_params:
        head += " F30000:1001 Ip A1:1 Xmeta=zz"
    head += " Cmono\n"
    marker = b"FRAME Xk=v\n" if frame_params else b"FRAME\n"
    payload = head.encode() + b"".join(marker + f for f in frames)
    gw, gh, gn, planes = decode_y4m(payload)
    assert (gw, gh, gn) == (w, h, len(frames))
    assert planes == b"".join(frames)
    with _pytest.raises(ValueError):
        decode_y4m(payload[:-1])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_box_pool_reference_properties(w, h, factor, seed):
    """The box-filter pooling reference obeys the defining invariants for
    any image and factor: output dims floor-divide, every pooled value
    lies within its block's [min, max], and a constant image pools to the
    constant. (The Spark kernel is pinned equal to this reference in
    tests/test_multimodal.py; hypothesis stresses the reference itself.)"""
    from tests.test_multimodal import _pool_reference

    if w // factor < 1 or h // factor < 1:
        return  # kernel rejects these; nothing to pool
    rnd = []
    x = seed
    for _ in range(w * h * 3):
        x = (1103515245 * x + 12345) % (2**31)
        rnd.append(x % 256)
    w2, h2, pooled = _pool_reference(w, h, rnd, factor)
    assert (w2, h2) == (w // factor, h // factor)
    assert len(pooled) == w2 * h2 * 3
    for orow in range(h2):
        for ocol in range(w2):
            for ch in range(3):
                block = [
                    rnd[((orow * factor + dy) * w + ocol * factor + dx) * 3 + ch]
                    for dy in range(factor)
                    for dx in range(factor)
                ]
                v = pooled[(orow * w2 + ocol) * 3 + ch]
                assert min(block) <= v <= max(block)
    const = [123] * (w * h * 3)
    assert set(_pool_reference(w, h, const, factor)[2]) == {123}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_bloom_no_false_negatives_property(spark, keys):
    """operators/bloom.py: for ANY key set (negatives, zero, wide range),
    every built key tests present — the law the prefilter's 'definitely
    missing' verdict rests on."""
    from cassandra_data_migrator_spark.operators import bloom

    df = spark.createDataFrame([(k,) for k in keys], "pk BIGINT")
    m = bloom.sized_bits(len(keys))
    packed = bloom.build_bloom(df, "pk", m)
    missed = bloom.with_bloom_flag(df, "pk", packed, m).filter("flagged").count()
    assert missed == 0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=150, unique=True),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=3),
)
def test_global_index_matches_full_row_number(spark, ids, nparts, bucket_chars):
    """operators/rank.global_index: for ANY input partitioning and ANY
    prefix width, the bucketed index must be bit-identical to
    row_number() over (order by key, id) - 1 — including md5-prefix
    collisions (narrow bucket_chars force many keys per bucket, so the
    within-bucket rank and the cross-bucket offsets both get exercised)."""
    from pyspark.sql import Window

    from cassandra_data_migrator_spark.operators.rank import global_index

    df = (
        spark.createDataFrame([(i,) for i in ids], "id BIGINT")
        .select("id", F.md5(F.col("id").cast("string").cast("binary")).alias("k"))
        .repartition(nparts)
    )
    got = {
        (r.id, r.pos, r.n_total)
        for r in global_index(df, "k", "id", bucket_chars=bucket_chars).collect()
    }
    w = Window.orderBy("k", "id")
    want = {
        (r.id, r.pos, len(ids))
        for r in df.withColumn(
            "pos", (F.row_number().over(w) - 1).cast("bigint")
        ).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc dd longword anotherlong".split()),
                 min_size=1, max_size=40),
        min_size=1, max_size=20,
    ),
    st.integers(min_value=2, max_value=5),
    st.integers(min_value=5, max_value=20),
)
def test_line_dedup_rebuild_matches_reference(spark, docs, line_tokens, min_chars):
    """operators/dedup.line_dedup_rebuild vs a pure-Python reference on
    generated corpora: identical keep-first winners, counts, and rebuilt
    text for ANY line width / min-chars cut — including corpora where the
    tiny vocabulary makes almost every line a duplicate (the hot-line
    regime) and where every line is short (full passthrough)."""
    from cassandra_data_migrator_spark.operators.dedup import line_dedup_rebuild

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_dropped"], r["text_dedup"])
        for r in line_dedup_rebuild(
            df, line_tokens=line_tokens, min_chars=min_chars
        ).collect()
    }

    # reference: same derivation, dict-ordered first-wins
    lines = {}  # doc_id -> [(pos, line)]
    for i, words in enumerate(rows):
        toks = rows[i][1].split()
        lines[i] = [
            (p // line_tokens, " ".join(toks[p : p + line_tokens]))
            for p in range(0, len(toks), line_tokens)
        ]
    first = {}
    for i in sorted(lines):
        for pos, line in lines[i]:
            if len(line) >= min_chars and line not in first:
                first[line] = (i, pos)
    want = {}
    for i in sorted(lines):
        kept = [
            (pos, line)
            for pos, line in lines[i]
            if len(line) < min_chars or first[line] == (i, pos)
        ]
        want[i] = (
            len(lines[i]),
            len(kept),
            len(lines[i]) - len(kept),
            "\n".join(l for _, l in sorted(kept)),
        )
    assert got == want


# --- URL canonicalization properties (r07) -------------------------------

_LABEL = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
_URL_PARTS = st.fixed_dictionaries(
    {
        "scheme": st.sampled_from(["http", "HTTP", "https", "HTTPS", "Http"]),
        "host": st.lists(_LABEL, min_size=1, max_size=3).map(".".join),
        "hostcase": st.booleans(),
        "port": st.sampled_from([None, 80, 443, 8080, 9042]),
        "path": st.lists(_LABEL, min_size=0, max_size=3).map(
            lambda xs: "".join("/" + x for x in xs)
        ),
        "trail": st.integers(min_value=0, max_value=3),
        "params": st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "z", "utm_source", "fbclid", "gclid"]),
                st.integers(min_value=0, max_value=99),
            ),
            max_size=4,
        ),
        "frag": st.sampled_from([None, "sec1", "x"]),
    }
)


def _assemble(p) -> str:
    host = p["host"].upper() if p["hostcase"] else p["host"]
    url = f"{p['scheme']}://{host}"
    if p["port"] is not None:
        url += f":{p['port']}"
    url += p["path"] + "/" * p["trail"]
    if p["params"]:
        url += "?" + "&".join(f"{k}={v}" for k, v in p["params"])
    if p["frag"] is not None:
        url += f"#{p['frag']}"
    return url


def _expected(p) -> str:
    scheme = p["scheme"].lower()
    out = f"{scheme}://{p['host']}"
    if p["port"] is not None and not (
        (scheme == "http" and p["port"] == 80)
        or (scheme == "https" and p["port"] == 443)
    ):
        out += f":{p['port']}"
    out += p["path"] or "/"
    kept = sorted(
        f"{k}={v}"
        for k, v in p["params"]
        if not k.startswith(("utm_", "fbclid", "gclid"))
    )
    if kept:
        out += "?" + "&".join(kept)
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(_URL_PARTS, min_size=1, max_size=20))
def test_url_canonicalization_matches_analytic_expectation(spark, parts):
    """For randomized well-formed URLs, the parsed canonical form must
    equal the analytically assembled expectation, and canonicalization
    must be idempotent (canon(canon(u)) == canon(u))."""
    from cassandra_data_migrator_spark.functions.urls import canonicalize_url

    urls = [_assemble(p) for p in parts]
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    got = [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    for p, g in zip(parts, got):
        assert g == _expected(p), f"{_assemble(p)!r}: got {g!r}"
    df2 = spark.createDataFrame([(u,) for u in got], "url STRING")
    again = [
        r.c for r in df2.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert again == got


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_property(w, h, rng):
    """encode_png -> decode_png is the identity on raw RGB for arbitrary
    dimensions (every filter type exercised whenever h >= 5), driver-side
    (pure functions, no Spark job needed)."""
    from cassandra_data_migrator_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert decode_png(encode_png(w, h, rgb)) == (w, h, 8, rgb)
