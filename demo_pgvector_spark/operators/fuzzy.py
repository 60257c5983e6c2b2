"""Edit-distance fuzzy join — PassJoin-style segment filtering + exact
Levenshtein verification, all in DataFrame ops.

The reference has no fuzzy matching (its only join is an equi-join,
src/lib/database.py:304-305); this is LLM-pipeline breadth (VERDICT r6
#5): entity resolution / near-duplicate short strings (author names,
titles, product names) where token-level Jaccard (dedup_ngram) is too
coarse — single-character typos leave every q-gram of a short string
broken, but edit distance sees them.

Algorithm (Li, Deng, Feng, "PassJoin: A Partition-based Method for
Similarity Joins", VLDB 2011 — public paper):

- Partition every string (as the INDEXED role) into ``tau + 1`` even
  segments. Pigeonhole over the ≤ tau edit operations: if
  ``ED(r, s) <= tau``, at least one segment of s survives untouched in
  r, as an exact substring whose start position differs from the
  segment's own start by at most tau (the loose window; PassJoin's
  tightened per-segment window is a subset — using the superset keeps
  completeness trivially and costs only extra candidates that the
  verify step kills).
- Every string (as the PROBE role) therefore emits, for each possible
  indexed length ``L`` in ``[len - tau, len + tau]`` and each segment
  index ``i``, the substrings of itself at the segment's length and at
  start positions shifted by ``-tau .. +tau``.
- Candidates = hash join of probe substrings against indexed segments
  on ``(L, i, substring)``; the position window is built into the
  probe enumeration (pos = segment start + shift). Both roles are
  emitted for every string, so any qualifying pair is found from
  whichever side's segment survived.
- Verify with Spark's built-in ``levenshtein`` (JVM-side, exact).

EXACTNESS: the correctness row's oracle is the BRUTE-FORCE pairwise
Levenshtein join in DuckDB, so row parity proves the segment filter
lost no pair — the same proof shape as ``dedup_ngram``'s AllPairs row.

100 TB posture: the probe side explodes to O(tau^2) rows per string and
the indexed side to ``tau + 1`` — both linear in the corpus with small
constants. The join shuffles on ``(L, i, substring)`` — short-segment
keys hash-partition evenly unless the corpus is pathologically
repetitive, in which case the hot segment buckets are exactly the
AQE-skew-join case the session enables. Candidate verification is a
scan-fused ``levenshtein`` filter, no further exchange. No Python rows
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segment_cols(p: int):
    """Segment start (1-based) and length for segment ``i`` of a string
    of length ``L`` under an even ``p``-way partition: floor boundaries,
    matching ``substring``'s 1-based indexing."""
    start = (F.lit(1) + F.floor(F.col("i") * F.col("L") / p)).cast("int")
    seglen = (
        F.floor((F.col("i") + 1) * F.col("L") / p)
        - F.floor(F.col("i") * F.col("L") / p)
    ).cast("int")
    return start, seglen


def edit_distance_join(
    names: DataFrame,
    tau: int = 2,
    id_col: str = "id",
    name_col: str = "name",
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(name_a, name_b) <= tau``.

    Returns (id_a, id_b, dist) with ``dist`` BIGINT. Output-quadratic by
    contract (it emits every qualifying pair), like the other pair
    generators in the dedup family.
    """
    if tau < 0:
        raise ValueError("tau must be >= 0")
    p = tau + 1
    spark = names.sparkSession
    base = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.length(name_col).alias("len"),
    )

    # Indexed role: the tau+1 segments of each string.
    seg_start, seg_len = _segment_cols(p)
    indexed = (
        base.withColumn("L", F.col("len"))
        .crossJoin(F.broadcast(spark.range(p).select(F.col("id").cast("int").alias("i"))))
        .withColumn("_start", seg_start)
        .withColumn("_seglen", seg_len)
        .filter(F.col("_seglen") >= 1)
        .select(
            F.col("id").alias("idx_id"),
            "L",
            "i",
            F.expr("substring(name, _start, _seglen)").alias("seg"),
        )
    )

    # Probe role: substrings at every candidate indexed length and
    # shifted start. The (dl, i, shift) grid is (2*tau+1) * (tau+1) *
    # (2*tau+1) rows — broadcast, never shuffled.
    grid = spark.createDataFrame(
        [
            (dl, i, sh)
            for dl in range(-tau, tau + 1)
            for i in range(p)
            for sh in range(-tau, tau + 1)
        ],
        "dl int, i int, shift int",
    )
    probe_start, probe_seglen = _segment_cols(p)
    probes = (
        base.crossJoin(F.broadcast(grid))
        .withColumn("L", F.col("len") + F.col("dl"))
        .filter(F.col("L") >= 1)
        .withColumn("_start", probe_start)
        .withColumn("_seglen", probe_seglen)
        .withColumn("_pos", (F.col("_start") + F.col("shift")).cast("int"))
        .filter(
            (F.col("_seglen") >= 1)
            & (F.col("_pos") >= 1)
            & (F.col("_pos") + F.col("_seglen") - 1 <= F.col("len"))
        )
        .select(
            F.col("id").alias("probe_id"),
            "L",
            "i",
            F.expr("substring(name, _pos, _seglen)").alias("seg"),
        )
    )

    matched = probes.join(indexed, ["L", "i", "seg"]).select(
        "probe_id", "idx_id"
    )

    # Degenerate bucket: an EMPTY string emits no segments (all are
    # zero-length) and contains no substrings, so pairs involving it are
    # invisible to the filter even though ED("", s) = len(s) <= tau can
    # qualify. Any partner must itself have len <= tau, so the bucket is
    # the tiny cross of empties x (len <= tau) strings — the PassJoin
    # paper's short-string special case, usually zero rows.
    empties = base.filter(F.col("len") == 0).select(
        F.col("id").alias("probe_id")
    )
    tiny = base.filter(F.col("len") <= tau).select(F.col("id").alias("idx_id"))
    matched = matched.union(empties.crossJoin(tiny))

    cand = (
        matched.filter(F.col("probe_id") != F.col("idx_id"))
        .select(
            F.least("probe_id", "idx_id").alias("id_a"),
            F.greatest("probe_id", "idx_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    a = base.select(F.col("id").alias("id_a"), F.col("name").alias("_name_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("name").alias("_name_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "dist", F.levenshtein("_name_a", "_name_b").cast("long")
        )
        .filter(F.col("dist") <= tau)
        .select("id_a", "id_b", "dist")
    )
