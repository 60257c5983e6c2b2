"""Skew-mitigation operators (brief: "skewed keys → salting or AQE
skew-join").

Where skew actually bites, and what this engine does about each:

- **Algebraic aggregates** (count/sum/min/max) on a heavy-hitter key:
  NOT a problem — Spark's map-side partial aggregation means the reduce
  side receives one partial row per (input partition, key), regardless
  of how hot the key is. No salting needed; don't add it.
- **Holistic aggregates** (collect_list for top-k): a heavy key's full
  row set lands on one reducer. ``similarity.topk_per_group`` solves it
  with spark_partition_id() as an implicit salt + k-bounded merge.
- **Sort-merge/shuffle-hash joins** on a skewed key: AQE's skew-join
  splits oversized partitions automatically (enabled in session.py).
  ``salted_join`` below is the explicit form for when AQE can't help —
  e.g. the skew is in the *output* (one key joins to millions of rows)
  or AQE is unavailable: the big side gets a deterministic per-row salt,
  the small side is exploded across all salt values, and the join key
  becomes (key, salt) — a hot key's rows spread over ``salt_buckets``
  reducers. Exact same result set as the unsalted join.

- **Exact distinct counts** on a skewed key: ``salted_count_distinct``
  spreads by the value itself (dedup on (key, value) first — the value
  is the perfect salt because duplicates of one value collapse
  map-side), then counts per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically (hash of
    the whole row — reproducible, no rand()), replicate the small side
    once per salt value, join on (key, salt). Output equals the plain
    join; the shuffle spreads each hot key over ``salt_buckets``
    partitions at the cost of a ``salt_buckets``× blowup of the SMALL
    side only.

    Only big-side-preserving join types are supported: for right/full
    outer joins an unmatched SMALL-side row would surface once per salt
    value (it was exploded across all of them), duplicating output rows
    — those joins need a post-aggregation this operator deliberately
    doesn't hide."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only big-side-preserving joins "
            f"{{'inner','left','left_semi','left_anti'}}, got {how!r}: "
            "unmatched small-side rows would be replicated salt_buckets times"
        )
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)),
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count_distinct(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact distinct count per key without concentrating a hot key on
    one reducer: dedupe (key, value) first — the value spreads the key,
    and duplicate values collapse in the map-side partial — then count.
    Two exchanges, both well-distributed."""
    return (
        df.select(key, value)
        .groupBy(key, value)
        .agg(F.lit(1).alias("_one"))
        .groupBy(key)
        .agg(F.count("_one").alias(out_col))
    )


# The hottest key's per-mille share of big-side rows at/above which the
# join is salted. Rationale: with P shuffle partitions a key holding
# share s of the rows caps the join's parallelism at ~1/s tasks doing
# useful work; s >= 5% means one reducer carries >= 5% of the table
# whatever P is — the point where AQE skew-split or salting visibly
# pays. Deliberately integer per-mille so the decision replays exactly
# in SQL (the oracle computes the same number).
SKEW_HOT_PER_MILLE = 50


def adaptive_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    hot_per_mille: int = SKEW_HOT_PER_MILLE,
    how: str = "inner",
) -> tuple[DataFrame, str]:
    """Diagnose-then-cure equi-join (VERDICT r8 #6 — the skew twin of
    ``layout_zorder_pruned`` closing its loop): run ``profile_skew``'s
    summary aggregate over the big side's key, then pick the plain join
    or ``salted_join`` by the hottest key's per-mille row share.
    Returns (joined, strategy) with strategy ∈ {'plain', 'salted'} so
    callers can record the decision; the RESULT is identical either way
    (the ``join_skew_salted`` invariant — salting must not change a
    row), which is what lets one oracle gate both branches.

    The diagnostic is ONE partial-combining count aggregate reduced to
    a single (max_cnt, n_rows) row collected to the driver — plan
    SELECTION is inherently driver-side (AQE makes the same kind of
    runtime decision from map-output statistics); the collect is one
    row regardless of table size, and it prices a full shuffle repay
    against one cheap pre-pass. All-integer math so the same decision
    replays bit-exactly on any engine."""
    stats = (
        big.groupBy(F.col(key))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("max_cnt"), F.sum("cnt").alias("n_rows"))
        .first()
    )
    hot = (
        stats["n_rows"] is not None
        and stats["n_rows"] > 0
        and (stats["max_cnt"] * 1000) // stats["n_rows"] >= hot_per_mille
    )
    if hot:
        return salted_join(big, small, key, salt_buckets, how), "salted"
    return big.join(small, [key], how), "plain"
