"""PageRank (operators/graph.py) — semantics on small known graphs.
Oracle parity at data scale is gated by the graph_pagerank CORRECTNESS
row; here: the recurrence against an independent Python replay, plus
structural properties."""

from __future__ import annotations

from demo_pgvector_spark.operators import graph


def _replay(edges, iters):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0.0) + ranks[s] / outdeg[s]
        ranks = {
            n: round(0.15 + 0.85 * contrib.get(n, 0.0), 6) for n in nodes
        }
    return ranks


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1),  # a cycle with a split
    (4, 3),                          # 4 is dangling-source only
    (5, 6),                          # isolated pair; 6 is a sink (dangling)
    (1, 2),                          # duplicate edge — must dedupe
]


def test_matches_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node_id"]: r["pr"] for r in graph.pagerank(df, 4).collect()}
    assert got == _replay(EDGES, 4)


def test_sink_and_source_shapes(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node_id"]: r["pr"] for r in graph.pagerank(df, 4).collect()}
    # a node with no in-edges settles at exactly the reset mass
    assert got[4] == 0.15 and got[5] == 0.15
    # the sink keeps receiving 0.85 * rank(5) = 0.85 * 0.15 + 0.15
    assert got[6] == round(0.15 + 0.85 * 0.15, 6)
    # every node present exactly once, even dedup'd-edge endpoints
    assert set(got) == {1, 2, 3, 4, 5, 6}
