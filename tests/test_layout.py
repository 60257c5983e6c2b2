"""Z-order layout (operators/layout.py): Morton-code correctness
against an independent bit-by-bit Python replay, plus the locality
property the layout exists for — bucket envelopes bound BOTH
dimensions, so a two-dimensional predicate prunes buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_pgvector_spark.operators import layout


def _morton_py(x: int, y: int) -> int:
    z = 0
    for bit in range(16):
        z |= ((x >> bit) & 1) << (2 * bit)
        z |= ((y >> bit) & 1) << (2 * bit + 1)
    return z


def test_morton_matches_bit_by_bit_replay(spark):
    pts = [(i * 137 % 65536, i * 401 % 65536) for i in range(500)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (70000, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", layout.morton_z(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_py(r["x"] & 65535, r["y"] & 65535), (
            r["x"],
            r["y"],
        )


def test_zorder_envelopes_bound_both_dimensions(spark):
    # a 256x256-key grid, bucket = z >> 4, i.e. each bucket is one 4x4
    # Morton tile: every bucket envelope must bound BOTH dimensions to
    # the tile width — the two-dimensional locality a single-column
    # sort cannot give (sorting by x leaves y's envelope full-width in
    # every bucket).
    pts = [(x * 8 + 4, y * 8 + 1) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    env = layout.zorder_envelopes(df, "x", "y", bucket_bits=28).collect()
    assert sum(e["n_rows"] for e in env) == len(pts)
    for e in env:
        assert e["x_max"] - e["x_min"] <= 16
        assert e["y_max"] - e["y_min"] <= 16


def test_zorder_envelope_counts_partition_the_input(spark):
    pts = [(i % 300, (i * 7) % 300) for i in range(2000)]
    df = spark.createDataFrame(pts, "x long, y long")
    env = layout.zorder_envelopes(df, "x", "y", bucket_bits=16)
    assert env.agg(F.sum("n_rows")).collect()[0][0] == 2000
