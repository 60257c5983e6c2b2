"""Hybrid retrieval fusion — reciprocal-rank fusion (RRF) over the two
retrieval pillars the engine already serves: the reference's dense
cosine top-k (operators/similarity.py sim_topk, the flagship re-stating
src/lib/database.py:299-309) and sparse Okapi BM25
(operators/curation.py bm25_topk). The reference predates hybrid
retrieval — its RAG loop is dense-only — so this is the modern
retrieval contract layered over the same two scans (VERDICT r9 #3).

RRF (Cormack/Clarke/Büttcher 2009): score(d) = Σ_lists 1/(k0 + rank_d),
summed over only the lists that contain d. Rank arithmetic here is
INTEGER-EXACT: each reciprocal is scaled to floor(RRF_SCALE/(k0+rank))
as a BIGINT, so the fused ordering replays bit-identically in any
engine (the per-mille/div precedent — no float summation order to
disagree about). With RRF_SCALE = 1e9 and k0 = 60, distinct
(k0+rank) ≤ 1075 values map to distinct quotients, so the scaled
ordering equals the rational ordering for any realistic list length.

Scale shape: the inputs are ALREADY top-k lists (k rows each — the
retrieval operators own the corpus-scale work and both end in
TakeOrderedAndProject). Fusion is a k-row full-outer join + a k-row
sort: no corpus pass, no shuffle wider than k rows, broadcast-trivial
on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K0 = 60
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    lists: dict[str, DataFrame],
    id_col: str = "doc_id",
    k0: int = RRF_K0,
    topk: int = 10,
) -> DataFrame:
    """Fuse named rank lists into one re-ranked list.

    ``lists`` maps a list name to a DataFrame with (``id_col``,
    ``rank``) where rank is 1-based and dense within the list. Output:
    (id, rank_<name>… , rrf_scaled) — per-list ranks carried through
    (NULL where the list missed the document), fused score
    ``Σ floor(RRF_SCALE/(k0+rank))`` over the lists that rank the
    document, ordered by (rrf_scaled DESC, id ASC), top ``topk``.
    """
    if not lists:
        raise ValueError("rrf_fuse requires at least one rank list")
    fused: DataFrame | None = None
    names = list(lists)
    for name in names:
        part = lists[name].select(
            F.col(id_col),
            F.col("rank").cast("int").alias(f"rank_{name}"),
        )
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    score = None
    for name in names:
        term = F.coalesce(
            F.expr(f"cast({RRF_SCALE} as bigint) div ({k0} + rank_{name})"),
            F.lit(0).cast("bigint"),
        )
        score = term if score is None else score + term
    return (
        fused.select(
            id_col,
            *[f"rank_{n}" for n in names],
            score.cast("bigint").alias("rrf_scaled"),
        )
        .orderBy(F.col("rrf_scaled").desc(), F.col(id_col).asc())
        .limit(int(topk))
    )
