"""PageRank semantics: hand-checkable graphs, truncation-bounded match
to the real-valued recurrence, partitioning invariance."""

from __future__ import annotations

from amadeus_spark.operators.graph import RANK_SCALE, pagerank


def _run(spark, edge_list, nodes, iters=5):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return {
        r["node"]: r["pr_us"]
        for r in pagerank(e, n, iterations=iters).collect()
    }


def _float_ref(edge_list, nodes, iters=5):
    """Independent float PageRank with the SAME integer truncations
    replaced by real division — the operator must track it to within
    the documented <1 micro-unit/edge/iteration drift."""
    outdeg = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(iters):
        s = {v: 0.0 for v in nodes}
        for u, v in edge_list:
            s[v] += pr[u] / outdeg[u]
        pr = {v: 0.15 / len(nodes) + 0.85 * s[v] for v in nodes}
    return pr


def test_symmetric_cycle_uniform(spark):
    # a 4-cycle: perfectly symmetric, every node keeps 1/4
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = _run(spark, edges, [0, 1, 2, 3])
    assert len(set(got.values())) == 1
    assert abs(got[0] - RANK_SCALE // 4) <= 20


def test_hub_outranks_leaves(spark):
    # everyone links to 0; 0 links back to 1 only
    edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
    got = _run(spark, edges, [0, 1, 2, 3])
    assert got[0] > got[1] > got[2] == got[3]
    ref = _float_ref(edges, [0, 1, 2, 3])
    for v, pr in ref.items():
        assert abs(got[v] - pr * RANK_SCALE) <= 5 * 4 * 5  # edges*iters slack


def test_no_inlink_node_keeps_teleport_only(spark):
    edges = [(0, 1), (1, 0), (2, 1)]  # node 2 has no in-links
    got = _run(spark, edges, [0, 1, 2])
    assert abs(got[2] - (15 * (RANK_SCALE // 3)) // 100) <= 2


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7 + 1) % 50) for i in range(50)] + [
        (i, (i * 13 + 2) % 50) for i in range(50)
    ]
    nodes = list(range(50))
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    a = {r["node"]: r["pr_us"] for r in pagerank(e, n, 5).collect()}
    b = {
        r["node"]: r["pr_us"]
        for r in pagerank(e.repartition(17), n.repartition(3), 5).collect()
    }
    assert a == b
