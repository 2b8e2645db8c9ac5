"""PageRank: Spark vs the pure-Python integer-contract twin."""

import pytest

from opentopodata_spark.operators.graph import UNIT, pagerank, pagerank_local


def _mk_edges(n_docs: int, m: int = 101):
    """The same deterministic host-graph synthesis the contract query
    uses: per doc, u = doc_id % m; hosts with u % 11 == 0 are dangling;
    others emit 1-3 edges depending on doc_id parity/mod-3."""
    edges = []
    for doc_id in range(n_docs):
        u = doc_id % m
        if u % 11 == 0:
            continue
        edges.append((u, (u * 7 + 1) % m))
        if doc_id % 2 == 0:
            edges.append((u, (u * 13 + 5) % m))
        if doc_id % 3 == 0:
            edges.append((u, (u * 29 + 17) % m))
    return [(u, v) for u, v in edges if u != v]


def _spark_ranks(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.where("src < 0")
    nd = None
    if nodes is not None:
        nd = spark.createDataFrame([(x,) for x in sorted(nodes)], "node long")
    out = pagerank(e, nodes=nd, **kw).collect()
    return {r.node: r.rank_units for r in out}


def test_matches_twin_on_synth_graph(spark):
    edges = _mk_edges(500)
    nodes = set(range(101))
    got = _spark_ranks(spark, edges, nodes=nodes, iterations=4)
    want = pagerank_local(edges, nodes=nodes, iterations=4)
    assert got == want
    # sanity: dangling hosts (u % 11 == 0 with no in-links from the
    # rules) exist and still carry the hold mass
    assert len(got) == 101
    assert min(got.values()) > 0


def test_node_universe_defaults_to_endpoints(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
    got = _spark_ranks(spark, edges, iterations=3)
    want = pagerank_local(edges, iterations=3)
    assert got == want
    assert set(got) == {1, 2, 3, 4}


def test_dangling_mass_redistributes(spark):
    # 2 -> nothing: node 2 is dangling; without redistribution node 3
    # (reachable only via 1->3) and node 2 would starve asymmetrically.
    edges = [(1, 2), (1, 3)]
    want = pagerank_local(edges, iterations=5)
    got = _spark_ranks(spark, edges, iterations=5)
    assert got == want
    base = UNIT // 3
    # node 2 gets hold + damped (half of node 1's rank + dangling share):
    # strictly more than the hold floor, and mass stays ~conserved
    hold = 15 * base // 100
    assert got[2] > hold
    assert abs(sum(got.values()) - UNIT) < 10 * 5  # floor leakage only


def test_duplicate_edges_and_self_loops_ignored(spark):
    edges = [(1, 2), (1, 2), (1, 1), (2, 1)]
    got = _spark_ranks(spark, edges, iterations=3)
    want = pagerank_local([(1, 2), (2, 1)], iterations=3)
    assert got == want


def test_layout_independence(spark):
    edges = _mk_edges(300)
    e = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r.node: r.rank_units
        for r in pagerank(e.repartition(1), iterations=3).collect()
    }
    b = {
        r.node: r.rank_units
        for r in pagerank(e.repartition(17, "dst"), iterations=3).collect()
    }
    assert a == b


def test_zero_iterations_is_uniform(spark):
    got = _spark_ranks(spark, [(1, 2), (2, 3)], iterations=0)
    assert got == {1: UNIT // 3, 2: UNIT // 3, 3: UNIT // 3}


def test_empty_graph(spark):
    assert _spark_ranks(spark, [], iterations=3) == {}


def test_operator_arg_validation(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping_pct=101)
