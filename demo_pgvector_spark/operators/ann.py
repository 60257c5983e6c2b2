"""Approximate nearest neighbor search: random-hyperplane LSH with
multiprobe, candidate filtering, and exact re-rank.

The reference has NO ANN index — ``config/init.sql:27-32`` creates no
ivfflat/hnsw index, so every search is an exact scan (SURVEY §4). Exact
scan stays this engine's faithful default (``operators/similarity.py``);
this module is the documented *scale path*: at 100 TB an exact scan per
probe reads everything, while LSH candidate generation reads a fixed
fraction.

Design (sign-random-projection LSH, Charikar's SimHash family):

- ``tables`` independent hash tables; each table owns ``bits`` random
  hyperplanes drawn from N(0,1)^dim with a fixed seed (deterministic —
  the same planes are shared with the DuckDB oracle via a golden
  parquet).
- signature(v, table) = Σ_j [dot(v, h_tj) >= 0] · 2^j  — an int per
  table, computed as pure Catalyst expressions (no Python in the row
  path; the dot products stay inside whole-stage codegen).
- Probe time: compute the probe's signatures, expand each by Hamming
  radius 1 (multiprobe — flip each bit once), and keep rows whose
  signature matches any probed bucket in any table. For the single-probe
  form this is a *filter* — no join, no shuffle; the scan + filter +
  ``TakeOrderedAndProject`` re-rank is one stage. If the table is
  written partitioned by ``sig_0`` the filter also prunes partitions
  (sublinear I/O); unpartitioned, it still prunes the sort.
- Re-rank: exact cosine over the candidates only.

Recall honesty: ANN is approximate by definition. On adversarially
uniform data (near-orthogonal vectors, like the synthetic testdata where
top-10 cosine ≈ 0.3 vs random ≈ 0) NO sublinear method achieves full
recall — the CORRECTNESS row therefore gates *implementation parity*
(DuckDB independently recomputes signatures, buckets, candidates, and
re-rank from the same plane constants and must produce the identical
result set), while recall quality is pytest-gated on clustered data
where the LSH family provably concentrates (tests/test_ann.py).

Sign stability across engines: the smallest |dot(v, plane)| over every
(vector, plane) pair in the testdata is ~2e-7 — nine orders of magnitude
above float64 summation-order noise, so Spark's sequential fold and
DuckDB's list_dot_product agree on every sign.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from demo_pgvector_spark.functions.vector import (
    cosine_similarity,
    dot,
    query_vector_literal,
)
from demo_pgvector_spark.operators.similarity import topk_per_group

DEFAULT_BITS = 8
DEFAULT_TABLES = 4
DEFAULT_SEED = 42


def hyperplanes(
    dim: int,
    bits: int = DEFAULT_BITS,
    tables: int = DEFAULT_TABLES,
    seed: int = DEFAULT_SEED,
) -> np.ndarray:
    """Deterministic (tables, bits, dim) hyperplane tensor."""
    return np.random.RandomState(seed).normal(0, 1, (tables, bits, dim))


def signature_col(vec: Column, table_planes: np.ndarray) -> Column:
    """Int signature of one hash table: bit j set iff dot(v, h_j) >= 0."""
    sig = F.lit(0)
    for j, plane in enumerate(table_planes):
        h = query_vector_literal([float(x) for x in plane])
        sig = sig + F.when(dot(vec, h) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def _signature_sql(vec_col: str, table_planes: np.ndarray) -> str:
    """``signature_col`` as ONE SQL string: identical arithmetic (float64
    zip_with product, sequential fold, sign at >= 0), but parsed in a
    single Py4J call instead of ~10 Column round-trips per plane — the
    per-Column form cost ~2 s of driver latency for 32 planes before any
    job started."""
    terms = []
    for j, plane in enumerate(table_planes):
        arr = "array(" + ",".join(f"{float(x)!r}D" for x in plane) + ")"
        d = (
            f"aggregate(zip_with({vec_col}, {arr},"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " 0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"IF({d} >= 0.0D, {1 << j}, 0)")
    return " + ".join(terms)


def with_signatures(
    df: DataFrame, planes: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``sig_0..sig_{L-1}`` int columns — all codegen, no shuffle."""
    return df.withColumns(
        {
            f"sig_{t}": F.expr(_signature_sql(vec_col, planes[t]))
            for t in range(planes.shape[0])
        }
    )


def probe_signatures(qvec: list[float], planes: np.ndarray) -> list[int]:
    """Driver-side signatures of a probe vector (same arithmetic as the
    column form: float64 dot, sign threshold at >= 0)."""
    q = np.asarray(qvec, dtype=np.float64)
    out = []
    for t in range(planes.shape[0]):
        sig = 0
        for j in range(planes.shape[1]):
            if float(planes[t, j] @ q) >= 0:
                sig |= 1 << j
        out.append(sig)
    return out


def multiprobe_buckets(sig: int, bits: int, hamming: int = 1) -> list[int]:
    """The probed bucket set: the signature itself plus every signature
    within Hamming distance ``hamming`` (radius 1 = flip each bit once)."""
    buckets = [sig]
    if hamming >= 1:
        buckets += [sig ^ (1 << j) for j in range(bits)]
    return buckets


def candidate_filter(
    vectors: DataFrame,
    qvec: list[float],
    planes: np.ndarray,
    vec_col: str = "embedding",
    hamming: int = 1,
) -> DataFrame:
    """Rows whose signature lands in any probed bucket of any table.

    Pure filter over codegen'd signature expressions — zero shuffle. With
    the table physically partitioned by ``sig_0`` this becomes partition
    pruning on table 0's buckets.
    """
    qsigs = probe_signatures(qvec, planes)
    bits = planes.shape[1]
    signed = with_signatures(vectors, planes, vec_col)
    cond = F.lit(False)
    for t, qs in enumerate(qsigs):
        cond = cond | F.col(f"sig_{t}").isin(multiprobe_buckets(qs, bits, hamming))
    return signed.filter(cond).drop(*[f"sig_{t}" for t in range(len(qsigs))])


def ann_topk(
    vectors: DataFrame,
    qvec: list[float],
    k: int = 10,
    planes: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming: int = 1,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidate filter → exact re-rank.

    The re-rank is ``orderBy(sim desc, id).limit(k)`` over candidates
    only — Spark plans it as ``TakeOrderedAndProject`` (per-partition
    partial top-k, no shuffle). Output: (id, similarity_score, rank).
    """
    if planes is None:
        planes = hyperplanes(len(qvec))
    cand = candidate_filter(vectors, qvec, planes, vec_col, hamming)
    q = query_vector_literal(qvec)
    scored = cand.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), q).alias("similarity_score"),
    )
    top = scored.orderBy(
        F.col("similarity_score").desc(), F.col(id_col).asc()
    ).limit(int(k))
    # Rank over the ≤k-row result — single tiny partition by construction
    # (post-limit), not a scale concern.
    from pyspark.sql import Window

    w = Window.orderBy(F.col("similarity_score").desc(), F.col(id_col).asc())
    return top.select(
        id_col, "similarity_score", F.row_number().over(w).alias("rank")
    )


def ann_join(
    probes: DataFrame,
    vectors: DataFrame,
    k: int = 3,
    planes: np.ndarray | None = None,
    dim: int = 64,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming: int = 1,
) -> DataFrame:
    """Approximate kNN *join* (many probes): bucket equi-join instead of
    a cross product.

    100 TB shape: the big side computes (table, signature) pairs —
    codegen, no shuffle — and joins on them against the exploded probe
    bucket list, which is tiny (probes × tables × (bits+1) rows) and
    broadcast. So the big side is never shuffled for candidate
    generation; only the surviving candidate pairs move, into the
    two-stage ``topk_per_group`` merge. Compare ``similarity.knn_join``
    which must score ALL |probes|×|vectors| pairs.
    """
    if planes is None:
        planes = hyperplanes(dim)
    tables_n, bits = planes.shape[0], planes.shape[1]

    sigs = with_signatures(vectors, planes, vec_col)
    sig_entries = F.array(
        *[
            F.struct(F.lit(t).alias("t"), F.col(f"sig_{t}").alias("sig"))
            for t in range(tables_n)
        ]
    )
    vec_buckets = sigs.select(
        F.col(id_col), F.col(vec_col), F.explode(sig_entries).alias("b")
    ).select(id_col, vec_col, F.col("b.t").alias("t"), F.col("b.sig").alias("sig"))

    probe_sigs = with_signatures(probes, planes, probe_vec)
    bucket_entries = []
    for t in range(tables_n):
        base = F.col(f"sig_{t}")
        buckets = [base] + (
            [base.bitwiseXOR(F.lit(1 << j)) for j in range(bits)] if hamming >= 1 else []
        )
        bucket_entries += [
            F.struct(F.lit(t).alias("t"), b.alias("sig")) for b in buckets
        ]
    probe_buckets = probe_sigs.select(
        F.col(probe_id), F.col(probe_vec), F.explode(F.array(*bucket_entries)).alias("b")
    ).select(probe_id, probe_vec, F.col("b.t").alias("t"), F.col("b.sig").alias("sig"))

    cand = (
        vec_buckets.join(F.broadcast(probe_buckets), ["t", "sig"], "inner")
        .select(probe_id, probe_vec, id_col, vec_col)
        .dropDuplicates([probe_id, id_col])
    )
    scored = cand.select(
        F.col(probe_id),
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col(probe_vec)).alias("similarity_score"),
    )
    return topk_per_group(scored, probe_id, id_col, "similarity_score", k)


# --------------------------------------------------------------------------
# Product quantization (PQ) — compressed asymmetric-distance search
# --------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_K = 16         # codewords per subspace
PQ_SHORTLIST = 50  # ADC candidates kept for exact re-rank


def _sub_lit(vec: list[float], s: int, subdim: int) -> str:
    seg = vec[s * subdim:(s + 1) * subdim]
    return "array(" + ",".join(f"{float(x)!r}D" for x in seg) + ")"


def pq_topk(
    vectors: DataFrame,
    seeds: list[list[float]],
    query: list[float],
    k: int = 10,
    shortlist: int = PQ_SHORTLIST,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization top-k: the memory-compressed ANN path.

    Each vector is (logically) encoded as ``m`` codes — per subspace the
    argmin-L2 codeword, ties to the lowest id — compressing a 64-float
    vector to 8 bytes (32×); search scores the ASYMMETRIC distance
    (query subvector ↔ assigned codeword, the classic ADC lookup-table
    formulation of Jégou et al.'s IVFADC, computed here as a
    constant-folded lookup since query and codebooks are both plan
    literals), takes a ``shortlist`` by ADC, and exact-re-ranks the
    shortlist by true L2. Codebooks here are seed-vector subvectors (the
    same driver-resident-constants contract as the IVF/kmeans inline
    path — a trained ``kmeans_lloyd`` per subspace drops into the same
    slots).

    Plan shape (pinned in tests/test_plans.py): scan → one projection
    with m·k in-subspace fold expressions → TakeOrderedAndProject
    (shortlist) → re-rank projection → TakeOrderedAndProject(k). ZERO
    exchanges, zero joins, zero Python. Literal budget is
    2·m·k·subdim + dim doubles (~2.1k here) — far below the
    INLINE_MAX_LITERALS plan-compile ceiling (operators/ivf.py); larger
    codebooks switch to the broadcast-join encode path exactly like
    assign_clusters_auto.

    At 100 TB the codes are PRE-computed at ingest (a projection of this
    stage-1 expression persisted next to the table, 8 bytes a row) and
    only the lookup-table scoring runs per query.
    """
    dim = len(query)
    subdim = dim // m
    sub_scores = []
    for s in range(m):
        sub = f"slice({vec_col}, {s * subdim + 1}, {subdim})"
        dists = [
            f"aggregate(zip_with({sub}, {_sub_lit(seed, s, subdim)},"
            " (x, y) -> (double(x) - y) * (double(x) - y)), 0D, (a, x) -> a + x)"
            for seed in seeds
        ]
        sub_scores.append(f"array({', '.join(dists)})")
    # stage 1 projected separately: HOF lambdas are opaque to codegen
    # CSE, and the argmin below references each _sd twice (min + position)
    staged = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        *[F.expr(e).alias(f"_sd{s}") for s, e in enumerate(sub_scores)],
    )
    adc_terms = []
    for s in range(m):
        # The query-to-codeword tables are constants: fold them driver-
        # side in POSITION ORDER (a left-to-right IEEE sum — the same
        # addend order DuckDB's list_sum and the stage-1 Spark fold use,
        # so the doubles are bit-identical across engines) and inline
        # m·k plain literals instead of m·k parse-heavy fold expressions.
        qseg = query[s * subdim:(s + 1) * subdim]
        qtable = []
        for seed in seeds:
            cseg = seed[s * subdim:(s + 1) * subdim]
            acc = 0.0
            for x, y in zip(qseg, cseg):
                d = float(x) - float(y)
                acc += d * d
            qtable.append(acc)
        qlits = ", ".join(f"{v!r}D" for v in qtable)
        adc_terms.append(
            f"element_at(array({qlits}),"
            f" cast(array_position(_sd{s}, array_min(_sd{s})) as int))"
        )
    cand = (
        staged.select(
            F.col(id_col),
            F.col(vec_col),
            F.expr(" + ".join(adc_terms)).alias("_adc"),
        )
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    qlit = "array(" + ",".join(f"{float(x)!r}D" for x in query) + ")"
    l2 = (
        f"aggregate(zip_with({vec_col}, {qlit},"
        " (x, y) -> (double(x) - y) * (double(x) - y)), 0D, (a, x) -> a + x)"
    )
    return (
        cand.select(F.col(id_col), F.col("_adc"), F.expr(l2).alias("_l2"))
        .orderBy(F.col("_l2").asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col),
            F.round("_adc", 6).alias("adc_dist"),
            F.round("_l2", 6).alias("l2_dist"),
        )
    )


def ivfpq_topk(
    spark,
    vectors: DataFrame,
    cents: list[list[float]],
    seeds: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = PQ_SHORTLIST,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ — the production ANN stack at 100 TB (Jégou et al.'s
    IVFADC): coarse quantization prunes to ``nprobe`` of the k cluster
    cells, then PQ asymmetric-distance scoring ranks ONLY the surviving
    candidates, and the shortlist exact-re-ranks.

    Pure composition of two already-gated pieces: the inline
    argmax-cosine cluster assignment + driver-side probe ranking from
    operators/ivf.py (identical semantics and tie-breaks to
    vec_ivf_topk), and ``pq_topk`` over the filtered candidate set. The
    whole thing stays one zero-exchange plan: scan → assignment
    projection → cluster IN filter → PQ folds → two heaps. Swap the
    in-plan assignment for `ivf_write_clustered`'s partitioned layout
    and the filter becomes partition pruning (the vec_ivf_pruned row
    gates that storage path).
    """
    from demo_pgvector_spark.operators import ivf as ivf_ops

    probe_ids = ivf_ops._rank_centroids(spark, cents, query, nprobe)
    assigned = ivf_ops.assign_clusters_inline(vectors, cents, id_col, vec_col)
    cand = assigned.filter(F.col("cluster").isin(probe_ids)).select(
        id_col, vec_col
    )
    return pq_topk(
        cand, seeds, query, k=k, shortlist=shortlist, m=m,
        id_col=id_col, vec_col=vec_col,
    )
