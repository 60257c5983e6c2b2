"""Batch sessionization (operators/relational.py sessionize): known
timelines with boundary gaps, ties, and multi-user interleaving."""

from __future__ import annotations

from datetime import datetime

from demo_pgvector_spark.operators.relational import sessionize


def _ev(eid, user, ts):
    return (eid, datetime.fromisoformat(ts), user)


ROWS = [
    # user 1: three events inside one session (gaps 299 s and 300 s —
    # the 300 s gap is NOT > gap, so it does not split), then a 301 s
    # gap that does
    _ev(1, 1, "2024-01-01 10:00:00"),
    _ev(2, 1, "2024-01-01 10:04:59"),
    _ev(3, 1, "2024-01-01 10:09:59"),
    _ev(4, 1, "2024-01-01 10:15:00"),
    # user 2: same-timestamp tie — event_id breaks the order
    _ev(6, 2, "2024-01-01 09:00:00"),
    _ev(5, 2, "2024-01-01 09:00:00"),
    _ev(7, 2, "2024-01-02 09:00:00"),
]


def test_sessionize_gap_boundary_ties_and_sequences(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long"
    )
    got = {
        r["event_id"]: (r["user_id"], r["session_seq"], r["event_seq"])
        for r in sessionize(df, gap_seconds=300).collect()
    }
    assert got == {
        1: (1, 1, 1),
        2: (1, 1, 2),
        3: (1, 1, 3),   # 300 s gap: NOT > 300, same session
        4: (1, 2, 1),   # 301 s gap: new session
        5: (2, 1, 1),   # tie at 09:00:00 — lower event_id first
        6: (2, 1, 2),
        7: (2, 2, 1),
    }


def test_sessionize_formats_ts_and_counts_rows(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long"
    )
    out = sessionize(df, gap_seconds=300).collect()
    assert len(out) == len(ROWS)
    assert all(len(r["ts"]) == 19 for r in out)  # yyyy-MM-dd HH:mm:ss


def test_profile_columns_exact_stats(spark):
    from demo_pgvector_spark.operators.relational import profile_columns

    rows = [
        (1, "a"), (2, "b"), (2, None), (None, "a"), (3, "c"), (3, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, s string")
    got = {
        r["column"]: (
            r["n"], r["n_null"], r["n_distinct"], r["min_val"], r["max_val"]
        )
        for r in profile_columns(df, int_cols=("k",), str_cols=("s",)).collect()
    }
    assert got == {
        "k": (5, 1, 3, "1", "3"),   # n counts non-null; distinct ignores null
        "s": (5, 1, 3, "a", "c"),
    }
