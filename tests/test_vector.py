"""Property tests for the vector function / similarity operator core."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_pgvector_spark import tables
from demo_pgvector_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    query_vector_literal,
)
from demo_pgvector_spark.operators.similarity import sim_topk
from demo_pgvector_spark.registry import _query_vec


def test_stored_vectors_are_normalized(spark, sf_dir):
    # faithful to reference src/lib/embedding.py:115-118 (L2-normalized store)
    emb = tables.load(spark, sf_dir, "embeddings")
    bad = emb.filter(
        F.abs(l2_norm(F.col("embedding")) - 1.0) > 1e-5
    ).count()
    assert bad == 0


def test_cosine_bounds(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    qv = query_vector_literal(_query_vec(spark, sf_dir))
    sims = emb.select(cosine_similarity(F.col("embedding"), qv).alias("s"))
    out_of_range = sims.filter((F.col("s") < -1.0 - 1e-9) | (F.col("s") > 1.0 + 1e-9))
    assert out_of_range.count() == 0


def test_self_similarity_is_one(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    row = emb.select(
        cosine_similarity(F.col("embedding"), F.col("embedding")).alias("s")
    ).agg(F.min("s"), F.max("s")).first()
    assert abs(row[0] - 1.0) < 1e-9 and abs(row[1] - 1.0) < 1e-9


def test_normalize_idempotent(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").limit(50)
    renorm = emb.select(l2_norm(l2_normalize(F.col("embedding"))).alias("n"))
    bad = renorm.filter(F.abs(F.col("n") - 1.0) > 1e-9).count()
    assert bad == 0


def test_topk_subset_of_threshold_set(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    docs = tables.load(spark, sf_dir, "documents")
    q = _query_vec(spark, sf_dir)
    topk = sim_topk(emb, docs, q, top_k=5, threshold=0.1)
    ids = {r["vec_id"] for r in topk.select("vec_id").collect()}
    qv = query_vector_literal(q)
    allowed = {
        r["vec_id"]
        for r in emb.select(
            "vec_id", cosine_similarity(F.col("embedding"), qv).alias("s")
        )
        .filter(F.col("s") >= 0.1)
        .collect()
    }
    assert ids <= allowed and len(ids) <= 5


def test_threshold_validation(spark, sf_dir):
    # mirrors cli/search_doc_chunks.py:51-55 range check
    import pytest

    emb = tables.load(spark, sf_dir, "embeddings")
    docs = tables.load(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        sim_topk(emb, docs, [0.0] * 64, threshold=1.5)


def test_dot_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = tables.load(spark, sf_dir, "embeddings").limit(20)
    rows = emb.select("vec_id", "embedding").collect()
    q = _query_vec(spark, sf_dir)
    qv = query_vector_literal(q)
    got = {
        r["vec_id"]: r["d"]
        for r in emb.select("vec_id", dot(F.col("embedding"), qv).alias("d")).collect()
    }
    for r in rows:
        expect = float(np.dot(np.asarray(r["embedding"], dtype=np.float64), np.asarray(q)))
        assert abs(got[r["vec_id"]] - expect) < 1e-12


def test_mmr_rerank_matches_python_replay(spark, sf_dir):
    """Pure-Python replay of the MMR greedy recursion on the real
    testdata (query vec excluded, 6dp rounding, id tie-break) — and the
    margin gate (the ADVICE-r6 pattern): at every greedy step the gap
    between the chosen and runner-up ROUNDED scores must clear 2e-6, so
    the argmax can never hinge on a cross-engine rounding boundary."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from demo_pgvector_spark.operators.similarity import mmr_rerank
    from demo_pgvector_spark.registry import QUERY_VEC_ID

    def rnd6(x):
        # Spark's round() = BigDecimal.valueOf(double).setScale(6,
        # HALF_UP), i.e. HALF_UP over the double's SHORTEST decimal
        # repr — python round() is half-even and flips every score
        # whose 7th digit is exactly 5, which here is every step where
        # (simq − maxp) has an odd last digit (the λ=0.5 halving)
        return float(Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    emb = tables.load(spark, sf_dir, "embeddings")
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    qv = [float(x) for x in _query_vec(spark, sf_dir)]

    def _dot(a, b):
        # sequential left-to-right fold — bit-for-bit the Spark
        # aggregate(zip_with(...)) expression (numpy's BLAS dot sums
        # pairwise and diverges in the last ulp, which flips 6dp
        # rounding on boundary-sitting sims)
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        return _dot(a, b) / math.sqrt(_dot(a, a) * _dot(b, b))

    pool_size, k, lam = 12, 5, 0.5
    cands = {i: rnd6(cos(v, qv)) for i, v in rows.items()
             if i != QUERY_VEC_ID}
    pool = sorted(cands, key=lambda i: (-cands[i], i))[:pool_size]
    selected, want = [], []
    for t in range(1, k + 1):
        scores = {}
        for c in pool:
            if c in selected:
                continue
            if not selected:
                scores[c] = rnd6(lam * cands[c])
            else:
                maxp = max(rnd6(cos(rows[c], rows[s])) for s in selected)
                scores[c] = rnd6(lam * cands[c] - (1 - lam) * maxp)
        ranked = sorted(scores, key=lambda i: (-scores[i], i))
        pick = ranked[0]
        if len(ranked) > 1:  # margin gate: argmax never decided by <2e-6
            assert scores[pick] - scores[ranked[1]] >= 2e-6 or (
                scores[pick] == scores[ranked[1]]  # id tie is deterministic
            ), (t, scores[pick], scores[ranked[1]])
        selected.append(pick)
        want.append((pick, t, scores[pick]))

    got = [
        (r["vec_id"], r["mmr_rank"], r["mmr_score"])
        for r in mmr_rerank(
            emb.filter(F.col("vec_id") != QUERY_VEC_ID),
            _query_vec(spark, sf_dir),
            pool_size=pool_size,
            k=k,
            lam=lam,
        ).collect()
    ]
    assert sorted(got, key=lambda r: r[1]) == want


def test_mmr_scores_are_nondegenerate(spark, sf_dir):
    # with the query vector excluded, later picks must carry varied,
    # informative scores (the vec-0-in-pool regression collapsed every
    # rank>1 score to exactly 0.0 and the gate to an id-order sort)
    from demo_pgvector_spark.registry import q_vec_mmr_rerank

    got = q_vec_mmr_rerank(spark, sf_dir).collect()
    assert len(got) == 8
    tail_scores = {r["mmr_score"] for r in got if r["mmr_rank"] > 1}
    assert len(tail_scores) > 1


def test_rrf_fuse_integer_scores_and_missing_lists(spark):
    """rrf_fuse: fused score is the exact BIGINT floor sum, documents
    missing from one list contribute only the other list's term (NULL
    rank carried through), ties break by ascending id."""
    from demo_pgvector_spark.operators import retrieval

    dense = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    sparse = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    out = {
        r["doc_id"]: r
        for r in retrieval.rrf_fuse(
            {"dense": dense, "sparse": sparse}, topk=10
        ).collect()
    }
    s = 1_000_000_000
    assert out[2]["rrf_scaled"] == s // 62 + s // 61  # both lists
    assert out[1]["rrf_scaled"] == s // 61  # dense only
    assert out[1]["rank_sparse"] is None
    assert out[4]["rrf_scaled"] == s // 62
    assert out[4]["rank_dense"] is None
    # doc 1 (dense rank 1) and doc 4 (sparse rank 2): 1/61 > 1/62
    ordered = [
        r["doc_id"]
        for r in retrieval.rrf_fuse(
            {"dense": dense, "sparse": sparse}, topk=10
        ).collect()
    ]
    assert ordered[0] == 2 and ordered[1] == 1


def test_ood_score_matches_numpy_replay(spark, monkeypatch):
    """q_vec_ood_score vs a pure-numpy replay of the full definition:
    argmax-cosine assignment to the seed centroids, 6dp-rounded scaled
    sims, exact integer cluster moments, z = (n·x − s1)/sqrt(n·s2 −
    s1²), flag at z < −2 (zero-variance clusters flag nothing)."""
    import math

    import numpy as np

    import demo_pgvector_spark.registry as reg

    rng = np.random.RandomState(3)
    vecs = rng.normal(0, 1, (80, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(80)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    monkeypatch.setattr(reg.tables, "load", lambda _s, _d, _t: df)
    got = {
        r["vec_id"]: r for r in reg.q_vec_ood_score(spark, "x").collect()
    }

    cents = vecs[:16]
    sims_to = vecs @ cents.T  # unit vectors: dot == cosine
    cluster = sims_to.argmax(axis=1)
    scaled = {
        i: int(math.floor(round(sims_to[i, cluster[i]], 6) * 1e6 + 0.5))
        for i in range(80)
    }
    for cl in set(cluster):
        members = [i for i in range(80) if cluster[i] == cl]
        n = len(members)
        s1 = sum(scaled[i] for i in members)
        s2 = sum(scaled[i] ** 2 for i in members)
        den = math.sqrt(n * s2 - s1 * s1) if n * s2 - s1 * s1 > 0 else None
        for i in members:
            assert got[i]["cluster"] == cl
            assert got[i]["sim_scaled"] == scaled[i]
            if den is None or den == 0.0:
                assert got[i]["z"] is None and not got[i]["is_outlier"]
            else:
                want = (n * scaled[i] - s1) / den
                assert abs(got[i]["z"] - round(want, 4)) <= 1e-9
                assert got[i]["is_outlier"] == (want < -2.0)
