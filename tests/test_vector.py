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
