"""IVF (inverted-file) approximate nearest neighbor — the
centroid-partitioned scale path complementing the LSH family in
operators/ann.py (brief: "an IVF or LSH-bucketed variant as the scale
path").

Shape: vectors are assigned to their nearest centroid once (a write-time
partitioning at scale — stored as a partition column, giving partition
pruning on probes); a probe searches only the ``nprobe`` clusters whose
centroids are nearest to it, then exact-re-ranks the candidates.

Centroid choice is pluggable: the CORRECTNESS row uses fixed seed
vectors (deterministic, oracle-replicable — cross-engine argmin margins
on the testdata are ≥1e-5, nine orders above float noise); real
deployments train with ``kmeans_lloyd`` below — Lloyd's algorithm as
pure DataFrame ops, iterating assignment (broadcast centroids → argmax
similarity) and update (element-wise mean via posexplode) with only the
k×dim centroid matrix ever touching the driver between iterations (the
same shape MLlib's KMeans uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_pgvector_spark.functions.vector import cosine_similarity, query_vector_literal


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
) -> DataFrame:
    """(id, embedding, cluster): each vector's nearest centroid by cosine.
    Centroids broadcast (k rows); one argmax aggregation, no skew — every
    vector contributes exactly k scored rows collapsed map-side."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(centroid_id),
        cosine_similarity(F.col(vec_col), F.col(centroid_vec)).alias("_sim"),
    )
    return scored.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        F.expr(f"max_by({centroid_id}, _sim)").alias("cluster"),
    )


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    qvec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
) -> DataFrame:
    """IVF search: rank centroids against the probe, keep the ``nprobe``
    nearest clusters, exact-re-rank only their members. With assignments
    stored as a partition column this is partition pruning; computed
    on the fly it is a broadcast semi-join — the big side never
    shuffles."""
    q = query_vector_literal(qvec)
    top_clusters = (
        centroids.select(
            F.col(centroid_id),
            cosine_similarity(F.col(centroid_vec), q).alias("_csim"),
        )
        .orderBy(F.col("_csim").desc(), F.col(centroid_id).asc())
        .limit(int(nprobe))
        .select(centroid_id)
    )
    assigned = assign_clusters(
        vectors, centroids, id_col, vec_col, centroid_id, centroid_vec
    )
    cand = assigned.join(
        F.broadcast(top_clusters),
        assigned["cluster"] == top_clusters[centroid_id],
        "leftsemi",
    )
    scored = cand.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("similarity_score")
    )
    top = scored.orderBy(
        F.col("similarity_score").desc(), F.col(id_col).asc()
    ).limit(int(k))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("similarity_score").desc(), F.col(id_col).asc())
    return top.select(
        id_col, "similarity_score", F.row_number().over(w).alias("rank")
    )


def _farthest_point_init(
    vectors: DataFrame, k: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """Deterministic farthest-point (k-center) seeding: start from the
    min-id vector, then repeatedly add the vector least similar to its
    nearest existing seed — k-1 distributed argmin passes, no randomness
    (the deterministic cousin of k-means++'s D² sampling; naive first-k
    init can land every seed in one true cluster)."""
    first = vectors.orderBy(id_col).limit(1).select(vec_col).collect()[0][0]
    cents = [[float(x) for x in first]]
    for _ in range(k - 1):
        best_sim = F.greatest(
            *[
                cosine_similarity(F.col(vec_col), query_vector_literal(c))
                for c in cents
            ]
        ) if len(cents) > 1 else cosine_similarity(
            F.col(vec_col), query_vector_literal(cents[0])
        )
        far = (
            vectors.select(F.col(id_col), F.col(vec_col), best_sim.alias("_s"))
            .orderBy(F.col("_s").asc(), F.col(id_col).asc())
            .limit(1)
            .collect()[0]
        )
        cents.append([float(x) for x in far[vec_col]])
    return cents


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means on DataFrames: deterministic farthest-point init,
    then ``iters`` rounds of assign (broadcast centroids, argmax
    cosine) + update (element-wise mean via posexplode → groupBy(cluster,
    dim position) → re-collect). Only the k×dim centroid matrix is
    collected per iteration; every per-row step is distributed. Empty
    clusters keep their previous centroid.

    Returns (final assignment DataFrame, centroid matrix).
    """
    spark = vectors.sparkSession
    cents = _farthest_point_init(vectors, k, id_col, vec_col)

    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid int, cv array<double>"
        )
        assigned = assign_clusters(vectors, cdf, id_col, vec_col)
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).getField("m").alias("centroid")
            )
        )
        new = {r["cluster"]: [float(x) for x in r["centroid"]] for r in means.collect()}
        cents = [new.get(i, cents[i]) for i in range(k)]

    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, cv array<double>"
    )
    return assign_clusters(vectors, cdf, id_col, vec_col), cents
