"""Count-min sketch — bounded-memory frequency estimation.

Extension surface (the reference has no sketch tooling; Spark ships HLL
sketches but no frequency sketch): heavy-hitter detection over a key
domain too large for an exact per-key count table. A d×w grid of BIGINT
cells (d hash rows, w buckets) summarizes ANY number of items in
constant memory; est(item) = min over rows of its cell count
over-approximates the true count with error ≤ εN (w = ⌈e/ε⌉) at
confidence 1−δ (d = ⌈ln 1/δ⌉) — Cormode & Muthukrishnan, J.Alg 2005.

Why it matters at 100 TB: the sketch build is ONE pass with a
partial-combining aggregate over d·N emitted cells into a d×w-bounded
result — and sketches MERGE by cell-wise addition, so per-partition /
per-day / per-stream sketches roll up without reprocessing (the same
ingest-maintained-artifact contract as the IVF layout and the corpus
band index). An exact groupBy over the same domain carries n_keys state
through the shuffle; the sketch carries d·w BIGINTs, period.

Determinism contract: the hash rows are the repo's salted-md5 ticket
scheme (``sample_stratified`` precedent) — H_r(x) = base32(md5(r‖':'‖x))
mod w — so Spark, DuckDB, and a Python replay agree bit-identically;
counts and mins are BIGINT throughout, no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 256


def _h(r: int, item_sql: str, w: int) -> str:
    """SQL for hash row ``r``'s bucket of ``item_sql`` (a string expr)."""
    return (
        f"cast(conv(substring(md5(concat('{r}', ':', {item_sql})), 1, 8),"
        f" 16, 10) as bigint) % {w}"
    )


def countmin_build(
    df: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """The sketch as a relation: (r, bucket, cnt), ≤ depth·width rows.
    One pass: each input row explodes to its depth (r, bucket) cells,
    then ONE partial-combining count aggregate — map-side combine
    collapses the d× amplification before the (bounded) exchange."""
    item = f"cast({item_col} as string)"
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.expr(_h(r, item, width)).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("c")
    return (
        df.select(cells)
        .select("c.r", "c.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(item, est) for every probe item: est = min over the depth rows
    of the item's cell count (0 when a cell is empty — the sketch
    relation omits zero cells). The sketch side is ≤ d·w rows, so the
    lookup join broadcasts; the min is a per-item partial aggregate."""
    item = f"cast({item_col} as string)"
    pb = probes.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_h(r, item, width)).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(item_col, "c.r", "c.bucket")
    return (
        pb.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
