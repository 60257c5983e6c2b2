"""Skew-mitigation tests (operators/skew.py): salted operators must
produce exactly the plain operator's result on skewed data, and the
salt must actually spread the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.operators import skew


@pytest.fixture(scope="module")
def skewed_df(spark):
    # 90% of rows share key 0 — the heavy-hitter shape
    rows = [(i, i % 10 if i % 10 < 2 else 0, f"v{i % 7}") for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, key long, val string").cache()


@pytest.fixture(scope="module")
def dim_df(spark):
    return spark.createDataFrame(
        [(k, f"name_{k}") for k in range(10)], "key long, name string"
    )


def test_salted_join_equals_plain_join(spark, skewed_df, dim_df):
    plain = skewed_df.join(dim_df, "key").select("row_id", "key", "name")
    salted = skew.salted_join(skewed_df, dim_df, "key").select("row_id", "key", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_semantics(spark, skewed_df, dim_df):
    missing_dim = dim_df.filter(F.col("key") >= 5)  # keys 0,1 unmatched
    plain = skewed_df.join(missing_dim, "key", "left").select("row_id", "name")
    salted = skew.salted_join(skewed_df, missing_dim, "key", how="left").select(
        "row_id", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark, skewed_df):
    """The hot key's rows must land in multiple salt buckets."""
    b = skewed_df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed_df.columns]), F.lit(8)),
    )
    buckets = (
        b.filter(F.col("key") == 0).select("_salt").distinct().count()
    )
    assert buckets >= 6  # 800 rows over 8 buckets: all (or nearly all) hit


def test_salted_count_distinct_exact(spark, skewed_df):
    got = {
        r["key"]: r["n_distinct"]
        for r in skew.salted_count_distinct(skewed_df, "key", "val").collect()
    }
    want = {
        r["key"]: r["n"]
        for r in skewed_df.groupBy("key")
        .agg(F.countDistinct("val").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_rejects_small_side_preserving_how(spark, skewed_df):
    """right/full outer would replicate unmatched small-side rows once per
    salt value — the operator must refuse rather than return duplicates."""
    dim = spark.createDataFrame([(0, "zero")], "key int, name string")
    for how in ("right", "full", "full_outer", "right_outer", "cross"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            skew.salted_join(skewed_df, dim, "key", how=how)


def test_adaptive_join_picks_salted_on_hot_key(spark, skewed_df, dim_df):
    """80% of rows share key 0 (>= 50 per-mille) → 'salted', and the
    result must equal the plain join row-for-row."""
    joined, strategy = skew.adaptive_join(skewed_df, dim_df, "key")
    assert strategy == "salted"
    plain = skewed_df.join(dim_df, "key").select("row_id", "key", "name")
    got = joined.select("row_id", "key", "name")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_adaptive_join_picks_plain_on_uniform_key(spark, dim_df):
    """1000 distinct keys, perfectly uniform: the hottest key holds
    1 per-mille of rows — far under the 50-per-mille gate → 'plain'."""
    rows = [(i, i % 1000) for i in range(5000)]
    big = spark.createDataFrame(rows, "row_id long, key long")
    dim = spark.createDataFrame(
        [(k, f"n{k}") for k in range(1000)], "key long, name string"
    )
    joined, strategy = skew.adaptive_join(big, dim, "key")
    assert strategy == "plain"
    assert joined.count() == 5000


def test_adaptive_join_threshold_is_exact(spark):
    """The decision flips exactly at hot_per_mille — integer math, no
    float drift: 100 rows, hottest key holds 5 → 50 per-mille."""
    rows = [(i, 0 if i < 5 else i) for i in range(100)]
    big = spark.createDataFrame(rows, "row_id long, key long")
    dim = big.select("key").distinct().withColumn("name", F.lit("x"))
    _, at = skew.adaptive_join(big, dim, "key", hot_per_mille=50)
    _, above = skew.adaptive_join(big, dim, "key", hot_per_mille=51)
    assert (at, above) == ("salted", "plain")
