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


def test_asof_nearest_picks_closer_side_and_breaks_ties_backward(spark):
    from demo_pgvector_spark.operators import relational

    quotes = spark.createDataFrame(
        [
            (1, "2024-01-01", 100, 1.0),
            (1, "2024-01-10", 200, 2.0),
            (2, "2024-06-01", 300, 3.0),
        ],
        "k long, qt string, okey long, price double",
    ).selectExpr("k", "cast(qt as timestamp) qt", "okey", "price")
    probes = spark.createDataFrame(
        [
            (10, 1, "2024-01-03"),  # closer to 01-01 (2d vs 7d) -> backward
            (11, 1, "2024-01-08"),  # closer to 01-10 (2d vs 7d) -> forward
            (12, 1, "2024-01-05 12:00:00"),  # 4.5d both... backward tie
            (13, 2, "2023-01-01"),  # only a later quote -> forward
            (14, 2, "2024-12-01"),  # only an earlier quote -> backward
        ],
        "eid long, k long, pt string",
    ).selectExpr("eid", "k", "cast(pt as timestamp) pt")
    out = {
        r["eid"]: (r["side"], r["okey"])
        for r in relational.asof_join_nearest(
            probes, quotes, key="k", probe_ts="pt", quote_ts="qt",
            payload_cols=("okey", "price"), probe_cols=("eid",),
        ).collect()
    }
    assert out[10] == ("backward", 100)
    assert out[11] == ("forward", 200)
    assert out[12] == ("backward", 100)  # exact midpoint -> earlier
    assert out[13] == ("forward", 300)
    assert out[14] == ("backward", 300)
