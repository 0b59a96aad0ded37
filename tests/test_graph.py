"""PageRank operator (operators/graph.py): hand-checkable invariants the
oracle-parity sweep can't see — uniform rank on regular graphs, exact
agreement with a pure-Python power iteration on irregular ones, mass
conservation, and empty-graph degradation."""

from __future__ import annotations

from cassandra_data_migrator_spark.operators.graph import pagerank_pairs

SCHEMA = "id_a BIGINT, id_b BIGINT"


def _run(spark, pairs, iters=5):
    df = spark.createDataFrame(pairs, SCHEMA)
    return {r.doc_id: r.pr_r for r in pagerank_pairs(df, iters=iters).collect()}


def _reference(pairs, iters, d=0.85):
    """Pure-Python mirror, INCLUDING the 10dp contribution rounding."""
    edges = []
    for a, b in pairs:
        edges.append((a, b))
        edges.append((b, a))
    nodes = sorted({x for e in edges for x in e})
    deg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += round(pr[s] * d / deg[s], 10)
        pr = {v: 0.15 / n + round(contrib[v], 10) for v in nodes}
    return {v: round(pr[v], 6) for v in nodes}


def test_uniform_on_regular_graph(spark):
    """On any regular graph (here a 4-cycle) PageRank is exactly uniform
    at every iteration — 1/N per node."""
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert got == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}


def test_star_matches_python_reference(spark):
    """Irregular graph (star: hub 0, leaves 1-4): exact agreement with the
    pure-Python power iteration, hub strictly above every leaf."""
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4)]
    got = _run(spark, pairs)
    want = _reference(pairs, iters=5)
    assert got == want
    assert all(got[0] > got[leaf] for leaf in (1, 2, 3, 4))
    assert len({got[leaf] for leaf in (1, 2, 3, 4)}) == 1  # leaves symmetric


def test_path_matches_python_reference(spark):
    pairs = [(1, 2), (2, 3)]
    assert _run(spark, pairs) == _reference(pairs, iters=5)


def test_disconnected_components_independent(spark):
    """Two disjoint 2-cliques: uniform 1/4 each (mass never leaks across
    components)."""
    got = _run(spark, [(1, 2), (3, 4)])
    assert got == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}


def test_mass_conserved(spark):
    """Total rank stays ~1 (no dangling nodes in an undirected pair graph,
    so the only loss is the 10dp/6dp rounding)."""
    pairs = [(0, 1), (0, 2), (0, 3), (2, 3), (3, 4), (4, 5)]
    got = _run(spark, pairs)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_empty_graph(spark):
    assert _run(spark, []) == {}
