"""ANN quality and plan-shape tests (operators/ann.py).

Implementation parity (signatures/buckets/rerank vs an independent DuckDB
replication) is gated by the vec_ann_topk / vec_ann_join CORRECTNESS rows;
these tests gate what parity cannot: recall on data where the LSH family
concentrates, real candidate pruning, and the no-shuffle plan shape.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.operators import ann


def _clustered(n_clusters=8, per_cluster=60, dim=64, noise=0.08, seed=7):
    """Well-separated unit clusters — the regime LSH is built for.
    noise is per-dimension; total noise norm ≈ noise·√dim = 0.64, giving
    within-cluster cosine ≈ 0.8 vs cross-cluster ≈ 0."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(0, noise, (per_cluster, dim))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        rows += [(c * per_cluster + i, pts[i].tolist()) for i in range(per_cluster)]
    return rows


@pytest.fixture(scope="module")
def clustered_df(spark):
    return spark.createDataFrame(
        _clustered(), "vec_id long, embedding array<double>"
    ).cache()


def _exact_topk(rows, q, k):
    V = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    sims = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))
    return [int(ids[i]) for i in order[:k]]


def test_ann_recall_on_clustered_data(spark, clustered_df):
    rows = _clustered()
    planes = ann.hyperplanes(64)
    hits = misses = 0
    for probe_id in (0, 120, 300, 411):
        q = [x for x in rows[probe_id][1]]
        got = {
            r["vec_id"]
            for r in ann.ann_topk(clustered_df, q, k=10, planes=planes).collect()
        }
        want = set(_exact_topk(rows, np.array(q), 10))
        hits += len(got & want)
        misses += len(want - got)
    recall = hits / (hits + misses)
    assert recall >= 0.9, f"recall {recall:.2f} on clustered data"


def test_candidates_are_pruned(spark, clustered_df):
    """The filter must actually prune — otherwise ANN is a slow exact scan."""
    rows = _clustered()
    planes = ann.hyperplanes(64)
    n = clustered_df.count()
    cand = ann.candidate_filter(clustered_df, rows[0][1], planes).count()
    assert cand < 0.6 * n, f"candidates {cand}/{n} — no pruning"
    assert cand >= 10


def test_ann_topk_no_shuffle(spark, clustered_df):
    """Single-probe ANN must plan as scan → filter → TakeOrderedAndProject:
    no Exchange before the top-k."""
    rows = _clustered()
    plan = ann.ann_topk(clustered_df, rows[0][1])._jdf.queryExecution().executedPlan().toString()
    take_pos = plan.find("TakeOrderedAndProject")
    assert take_pos != -1, plan
    # the only exchange allowed is the post-limit single-partition rank
    assert "Exchange" not in plan[take_pos:], plan[take_pos:]


def test_ann_join_matches_exact_on_clustered(spark, clustered_df):
    """On separated clusters the bucket join must agree with the exact
    kNN join for nearly all probe/neighbor pairs."""
    from demo_pgvector_spark.operators.similarity import knn_join

    probes = clustered_df.filter(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    approx = ann.ann_join(probes, clustered_df, k=5)
    exact = knn_join(probes, clustered_df, k=5, normalized=False)
    a = {(r["probe_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.9


def test_pq_topk_matches_numpy_reference(spark):
    """PQ codes, ADC, and re-rank cross-checked against a plain numpy
    implementation of Jégou-style ADC on deterministic data."""
    import numpy as np

    rng = np.random.default_rng(7)
    n, dim, m, kcb = 120, 64, 8, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    seeds = [[float(x) for x in vecs[i]] for i in range(kcb)]
    query = [float(x) for x in vecs[0]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = ann.pq_topk(df, seeds, query, k=10).collect()

    # numpy reference (float64, same formulas)
    v = vecs.astype(np.float64).reshape(n, m, dim // m)
    cb = np.array(seeds, dtype=np.float64).reshape(kcb, m, dim // m)
    # codes: argmin over codewords per subspace (first minimum = lowest cid)
    d_vc = ((v[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(-1)  # n×k×m
    codes = d_vc.argmin(axis=1)  # n×m
    q = np.asarray(query, dtype=np.float64).reshape(m, dim // m)
    d_qc = ((q[None, :, :] - cb) ** 2).sum(-1)  # k×m
    adc = np.array([sum(d_qc[codes[i, s], s] for s in range(m)) for i in range(n)])
    shortlist = sorted(range(n), key=lambda i: (adc[i], i))[:50]
    l2 = ((vecs.astype(np.float64) - np.asarray(query)) ** 2).sum(-1)
    expect = sorted(shortlist, key=lambda i: (l2[i], i))[:10]

    assert [r["vec_id"] for r in got] == expect
    for r in got:
        assert r["adc_dist"] == pytest.approx(adc[r["vec_id"]], abs=2e-6)
        assert r["l2_dist"] == pytest.approx(l2[r["vec_id"]], abs=2e-6)
    # vec 0 IS the query and also codeword 0: exact zero distances
    assert got[0]["vec_id"] == 0 and got[0]["l2_dist"] == 0.0
