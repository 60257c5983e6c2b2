"""interval_overlap_join (operators/relational.py): the grid-bucketed
overlap join must equal the brute-force inequality join on adversarial
interval layouts — cell-boundary-straddling, nested, identical, point
intervals — while planning as a hash join (pinned in test_plans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_pgvector_spark.operators.relational import interval_overlap_join

A = [
    (1, 0, 5),      # short, cell 0
    (2, 60, 70),    # straddles the 64-cell boundary
    (3, 64, 64),    # point interval exactly on a boundary
    (4, 10, 200),   # long: spans 4 cells
    (5, 300, 310),  # far from everything
    (6, 63, 65),    # minimal straddle
]
B = [
    (10, 4, 8),      # overlaps 1 at its right edge
    (11, 64, 128),   # starts exactly on a boundary
    (12, 0, 400),    # covers everything
    (13, 201, 250),  # just past 4's end
    (14, 65, 65),    # point inside cell 1
]


def _brute(a, b):
    return sorted(
        (ai, bi)
        for ai, s1, e1 in a
        for bi, s2, e2 in b
        if s1 <= e2 and s2 <= e1
    )


def test_matches_brute_force_across_cell_boundaries(spark):
    a = spark.createDataFrame(A, "a_id long, a_start long, a_end long")
    b = spark.createDataFrame(B, "b_id long, b_start long, b_end long")
    for cell in (64, 7, 1000):  # boundary-heavy, tiny, single-cell
        got = sorted(
            (r["a_id"], r["b_id"])
            for r in interval_overlap_join(a, b, cell=cell).collect()
        )
        assert got == _brute(A, B), cell


def test_each_pair_emitted_exactly_once(spark):
    # interval pair sharing MANY cells must still appear once
    a = spark.createDataFrame([(1, 0, 640)], "a_id long, a_start long, a_end long")
    b = spark.createDataFrame([(2, 0, 640)], "b_id long, b_start long, b_end long")
    out = interval_overlap_join(a, b, cell=64).collect()
    assert len(out) == 1
