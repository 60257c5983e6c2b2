"""Forward-fill resampling (operators/timeseries.py): known timelines —
gap rows filled with the carried value, in-bucket last pick honors the
(ts, event_id) total order, grid spans exactly [first, last] bucket."""

from __future__ import annotations

from datetime import datetime

import pytest

from demo_pgvector_spark.operators.timeseries import resample_ffill


def _ev(eid, user, ts, value):
    return (eid, datetime.fromisoformat(ts), user, value)


ROWS = [
    # user 1: obs at 10:xx (two in-bucket, same ts — id breaks the tie),
    # nothing at 11:xx or 12:xx, obs at 13:05
    _ev(1, 1, "2024-01-01 10:15:00", 1.0),
    _ev(3, 1, "2024-01-01 10:45:00", 3.0),
    _ev(2, 1, "2024-01-01 10:45:00", 2.0),  # same ts as id 3 — 3 wins
    _ev(4, 1, "2024-01-01 13:05:00", 4.0),
    # user 2: single observation — one-row grid
    _ev(5, 2, "2024-01-01 23:59:59", 5.0),
]


def test_resample_fills_gaps_and_orders_in_bucket(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r["user_id"], r["bucket"]): (r["value_ff"], r["n_obs"])
        for r in resample_ffill(df, step="1 hour").collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00"): (3.0, 3),  # id 3 beats id 2 at same ts
        (1, "2024-01-01 11:00:00"): (3.0, 0),  # gap: carried forward
        (1, "2024-01-01 12:00:00"): (3.0, 0),
        (1, "2024-01-01 13:00:00"): (4.0, 1),
        (2, "2024-01-01 23:00:00"): (5.0, 1),
    }


def test_resample_rejects_multi_unit_steps(spark):
    """ADVICE r7 #1: multi-unit steps would silently drop observations
    landing in off-grid date_trunc buckets — must fail loudly."""
    df = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, value double"
    )
    with pytest.raises(ValueError, match="single-unit"):
        resample_ffill(df, step="2 hours")


def test_interpolate_known_values(spark):
    from demo_pgvector_spark.operators.timeseries import resample_interpolate

    rows = [
        # user 1: obs at 10:00 (v=2.0) and 13:00 (v=8.0) -> 11:00=4.0, 12:00=6.0
        _ev(1, 1, "2024-01-01 10:30:00", 2.0),
        _ev(2, 1, "2024-01-01 13:10:00", 8.0),
        # user 2: single observation -> one-row grid, no gaps
        _ev(3, 2, "2024-01-01 05:00:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r["user_id"], r["bucket"]): (r["value_li"], r["n_obs"])
        for r in resample_interpolate(df, step="1 hour").collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00"): (2.0, 1),
        (1, "2024-01-01 11:00:00"): (4.0, 0),
        (1, "2024-01-01 12:00:00"): (6.0, 0),
        (1, "2024-01-01 13:00:00"): (8.0, 1),
        (2, "2024-01-01 05:00:00"): (7.0, 1),
    }


def test_ts_anomaly_flags_planted_spike(spark, monkeypatch):
    """q_ts_anomaly on a controlled stream: a 10x spike after a stable
    history must flag; the stable rows and the early (short-history)
    rows must not."""
    from datetime import datetime, timedelta

    import demo_pgvector_spark.registry as reg

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        v = 100.0 + (i % 5)  # stable band 100-104
        rows.append((i, base + timedelta(minutes=i), 7, "tick", v, "{}"))
    rows.append((30, base + timedelta(minutes=30), 7, "tick", 1000.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(reg.tables, "load", lambda _s, _d, _t: df)
    got = {r["event_id"]: r for r in reg.q_ts_anomaly(spark, "x").collect()}
    assert got[30]["is_anomaly"]
    assert all(not got[i]["is_anomaly"] for i in range(30))
    assert all(got[i]["n_prev"] == i for i in range(21))


def test_ewma_matches_python_reference_and_windows_truncate(spark):
    """ewma_trailing: the dyadic-weight fold equals a pure-Python
    truncated EWMA (alpha = 1/2, window 16) on a crafted series under
    the floor-micro display contract (ewma_e6 BIGINT), the first row's
    window is 1 (ewma_e6 == micro-scaled value), and rows past the
    window forget observation 17 back."""
    from pyspark.sql import functions as F

    from demo_pgvector_spark.operators import timeseries as ts

    vals = [float(v) for v in
            [5, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]]
    rows = [
        (i, 1, f"2024-01-01 00:{i:02d}:00", vals[i]) for i in range(len(vals))
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_s string, value double"
        )
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    got = {
        r["event_id"]: (r["n_window"], r["ewma_e6"])
        for r in ts.ewma_trailing(df).collect()
    }

    import math

    def ref(i):
        window = vals[max(0, i - 15): i + 1]
        n = len(window)
        num = sum(
            int(v * 1_000_000 + 0.5) * (1 << (15 - n + p))
            for p, v in enumerate(window, start=1)
        )
        den = (1 << 16) - (1 << (16 - n))
        return math.floor(num / den + 0.5)

    for i in range(len(vals)):
        n, e = got[i]
        assert n == min(i + 1, 16), (i, n)
        assert e == ref(i), (i, e, ref(i))
    # single-element window is the micro-scaled value itself
    assert got[0][1] == int(vals[0] * 1_000_000)


def test_ewma_plan_one_exchange_no_join(spark):
    """ewma_trailing plans ONE hash exchange (the user_id partition) and
    no join/explode: the indexed fold is scan-fused over the window's
    frame list."""
    import re

    from demo_pgvector_spark import registry

    plan = (
        registry.q_ts_ewma(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) == 1, plan
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode
