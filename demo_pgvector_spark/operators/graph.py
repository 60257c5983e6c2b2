"""Iterative graph analytics — static PageRank over a DataFrame edge
list.

The reference has no graph surface (it is psycopg2 CRUD + one similarity
query); this is LLM-pipeline breadth: link-graph centrality is a
standard corpus-quality signal at web scale (Common Crawl pipelines rank
hosts by harmonic/PageRank-style centrality to weight or filter training
documents — the same role the model-based quality filter plays at the
document level).

Semantics: GraphX's ``staticPageRank`` contract (public Apache Spark
code) — the UNNORMALIZED fixed-iteration variant:

    rank_0(v)     = 1.0
    rank_{t+1}(v) = 0.15 + 0.85 * Σ_{u→v} rank_t(u) / outdeg(u)

Dangling-node mass is NOT redistributed (GraphX's choice), so the total
mass is not conserved — ranks are relative scores, not a probability
distribution. Ranks are quantized to 6 decimal places after every
iteration (the kmeans-oracle precedent): every per-edge contribution is
then computed from IDENTICAL operands on both engines, so the only
engine difference is double-summation order (~1e-16), nine orders below
the quantization step.

100 TB posture: each iteration is the canonical Pregel shape — one
shuffle keyed on edge src (rank lookup join), one keyed on dst
(contribution sum), one rank re-join on node id; the edge list is
read from a LAZY localCheckpoint so the distinct-edges shuffle runs
once, not once per iteration. ALL K iterations compile into ONE job
(no per-iteration action, no driver round-trips) — the fixed-K loop
needs no convergence count, which is what makes that possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
RESET = 0.15  # GraphX static PageRank: (1 - damping) with rank_0 = 1.0


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node_id, rank) after ``iterations`` fixed PageRank steps over the
    DISTINCT directed edge set. Nodes = every id appearing as src or
    dst; ranks quantized to 6dp per iteration."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .dropDuplicates(["src", "dst"])
        # lazy: materialized by the final action's first pass, reused by
        # every iteration's joins instead of re-running the distinct
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["id"] == contrib["dst"], "left"
        ).select(
            "id",
            F.round(
                F.lit(RESET) + F.lit(DAMPING) * F.coalesce(F.col("c"), F.lit(0.0)),
                6,
            ).alias("rank"),
        )
    # `pr`, not `rank`: RANK is a window-function keyword in ANSI SQL and
    # the oracle must use the identical column name
    return ranks.select(F.col("id").alias("node_id"), F.col("rank").alias("pr"))
