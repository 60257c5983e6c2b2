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


def test_buckets_for_box_matches_brute_force():
    # tile enumeration (pure bit math) vs checking every bucket's tile
    # range directly
    bits, half = 16, 8
    s = 16 - half
    box = (300, 700, 20, 600)
    got = layout.buckets_for_box(*box, bucket_bits=bits)
    want = sorted(
        layout._spread_py(xh, half) | (layout._spread_py(yh, half) << 1)
        for xh in range(256)
        for yh in range(256)
        if box[0] >> s <= xh <= box[1] >> s and box[2] >> s <= yh <= box[3] >> s
    )
    assert got == want and len(got) == 2 * 3  # x-tiles 1-2 × y-tiles 0-2


def test_zorder_pruned_scan_reads_only_intersecting_tiles(spark, tmp_path):
    """The close-the-loop pin (VERDICT r7 #2): zorder_write's bucket
    dirs must turn the rectangle's driver-enumerated bucket list into a
    pushed PARTITION filter — the scan lists only the intersecting
    tiles — with results identical to the unpruned filter."""
    import re

    pts = [(i, (i * 137) % 1024, (i * 401) % 1024) for i in range(4000)]
    df = spark.createDataFrame(pts, "row_id long, x long, y long")
    path = str(tmp_path / "ztab")
    layout.zorder_write(df, path, "x", "y", bucket_bits=16)

    box = (100, 400, 700, 900)  # x-tiles 0-1, y-tiles 2-3 of a 4x4 grid
    pruned = layout.zorder_pruned_scan(spark, path, "x", "y", box, bucket_bits=16)
    want = sorted(
        r ["row_id"]
        for r in df.filter(
            F.col("x").between(box[0], box[1])
            & F.col("y").between(box[2], box[3])
        ).collect()
    )
    assert sorted(r["row_id"] for r in pruned.collect()) == want

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z_bucket" in plan.split("PartitionFilters")[1][:300], plan
    n_buckets = len(layout.buckets_for_box(*box, bucket_bits=16))
    n_dirs = len(
        [p for p in __import__("os").listdir(path) if p.startswith("z_bucket=")]
    )
    assert n_buckets < n_dirs, (n_buckets, n_dirs)  # the skip is real
    m = re.search(r"partition count: (\d+)", plan)
    if m:  # formatting varies; the PartitionFilters assert is the contract
        assert int(m.group(1)) <= n_buckets, plan


def test_zorder_append_equals_full_rewrite(spark, tmp_path):
    """zorder_append (the layout pillar's ivf_append twin): write 4/5,
    append 1/5 — the resulting table must be ROW-FOR-ROW the full
    rewrite of the union, and the pruned rectangle scan over the
    appended layout must return exactly the rewrite's rows."""
    rows = [(i, (i * 37) % 200, (i * 91) % 200) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    grown = str(tmp_path / "grown")
    full = str(tmp_path / "full")
    layout.zorder_write(df.filter(F.col("id") % 5 != 0), grown, "x", "y",
                        bucket_bits=6)
    layout.zorder_append(df.filter(F.col("id") % 5 == 0), grown, "x", "y",
                         bucket_bits=6)
    layout.zorder_write(df, full, "x", "y", bucket_bits=6)

    def rows_of(path):
        return sorted(
            (r["id"], r["x"], r["y"], int(r["z_bucket"]))
            for r in spark.read.parquet(path).collect()
        )

    assert rows_of(grown) == rows_of(full) and len(rows_of(grown)) == 2000

    box = (40, 90, 100, 150)
    a = sorted(map(tuple, layout.zorder_pruned_scan(
        spark, grown, "x", "y", box, bucket_bits=6).select("id").collect()))
    b = sorted(map(tuple, layout.zorder_pruned_scan(
        spark, full, "x", "y", box, bucket_bits=6).select("id").collect()))
    assert a == b and len(a) > 0
