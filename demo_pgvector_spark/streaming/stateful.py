"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 extension: "(flat)MapGroupsWithState" — the escape hatch
for semantics the built-in windowed aggregations can't express).

``running_user_totals`` keeps one (count, sum) state per user and emits
the running totals every micro-batch the user appears in — the shape of
a feature-store updater or an online per-entity accumulator. State is
per-key (hash-partitioned by user), Arrow-batched in and out; at 100 TB
the state store is RocksDB-backed and bounded by the key cardinality,
not the event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) — emits the cumulative state
    each micro-batch the user has new events."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Sessionized funnel with event-time timeout (VERDICT r6 #6) — the full
# flatMapGroupsWithState shape: custom per-key state machine, event-time
# TIMEOUT eviction, append-mode emission of final rows.
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, a_id long, b_id long, outcome string, lag_seconds long"
)
# (armed click's event_id, its event time in micros, done marker)
FUNNEL_STATE_SCHEMA = "a_id long, a_us long, done boolean"

FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # conversion window: 24 h


def _funnel_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user state machine — ONE row per user, about the user's FIRST
    'click': 'converted' with the first qualifying 'purchase' (strictly
    after the click in (ts, event_id) order, within the 24 h window), or
    'expired' when the event-time watermark passes the click's window
    with no conversion.

    Expiry comparisons are in WHOLE MILLISECONDS (Spark's watermark and
    timeout-timestamp unit); event ordering and lag use full micros.
    Timeout rule, empirically pinned (tests/test_streaming.py boundary
    probe): a state with timeout timestamp t evicts iff ``t < wm``
    STRICTLY — a state at exactly t == wm survives. The data path applies
    the identical predicate via getCurrentWatermarkMs so an expiry
    observed with new data in the batch matches what the timeout callback
    would have emitted.
    """
    (user_id,) = key
    win_ms = FUNNEL_WINDOW_US // 1000

    def one(a_id, b_id, outcome, lag):
        return pd.DataFrame(
            {
                "user_id": pd.array([user_id], dtype="Int64"),
                "a_id": pd.array([a_id], dtype="Int64"),
                "b_id": pd.array([b_id], dtype="Int64"),
                "outcome": [outcome],
                "lag_seconds": pd.array([lag], dtype="Int64"),
            }
        )

    if state.hasTimedOut:
        a_id, a_us, done = state.get
        # done states never set a timeout, so this is a pending funnel
        state.update((a_id, a_us, True))
        yield one(a_id, None, "expired", None)
        return

    a_id = a_us = None
    done = False
    if state.exists:
        a_id, a_us, done = state.get

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    wm_ms = state.getCurrentWatermarkMs()

    out = []
    # pending funnel already expired relative to the batch-start
    # watermark (same strict rule as the timeout eviction)
    if not done and a_id is not None and a_us // 1000 + win_ms < wm_ms:
        out.append(one(a_id, None, "expired", None))
        done = True
    if not done:
        for ev_id, ts, ev_type in zip(
            rows["event_id"], rows["ts"], rows["event_type"]
        ):
            ts_us = ts.value // 1000  # pandas ns -> micros
            if a_id is None:
                if ev_type == "click":
                    a_id, a_us = int(ev_id), ts_us
            elif ev_type == "purchase" and (ts_us, int(ev_id)) > (a_us, a_id):
                if ts_us - a_us <= FUNNEL_WINDOW_US:
                    out.append(
                        one(
                            a_id,
                            int(ev_id),
                            "converted",
                            (ts_us - a_us) // 1_000_000,
                        )
                    )
                    done = True
                    break
    if a_id is not None:
        state.update((a_id, a_us, done))
        if not done:
            # strict eviction (t < wm) means t == wm survives; the guard
            # only protects against Spark's t <= wm API error for a
            # click armed at/behind the watermark
            state.setTimeoutTimestamp(max(a_us // 1000 + win_ms, wm_ms + 1))
    yield from out


def funnel_sessions(events: DataFrame) -> DataFrame:
    """The funnel machine over a WATERMARKED stream: group by user,
    custom state via applyInPandasWithState, EventTimeTimeout. APPEND
    output — every emitted row is final (converted/expired funnels are
    closed; nothing is ever revised).

    State bound at 100 TB: one (a_id, a_us, done) tuple per user that
    has clicked — key-cardinality, not event-volume; pending entries are
    evicted by the event-time timeout, and closed funnels persist only
    the done marker (a production deployment adds a TTL sweep for those;
    the bound is still #users, same class as the windowed aggregates'
    (span x keys))."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_funnel_stream(
    spark,
    landing: str,
    checkpoint_dir: str,
    schema_ddl: str,
    delay: str = "1 day",
    ts_col: str = "ts",
    state_partitions: int = 8,
) -> DataFrame:
    """Drain a staged landing directory (one micro-batch per file, mtime
    order) through the watermarked funnel machine; return the emitted
    rows as a batch DataFrame via the parquet-file-sink read-back (no
    driver materialization). The trailing no-data batch of
    ``availableNow`` fires the event-time timeouts with the final
    watermark — that is where 'expired' rows for quiet users emit.

    Tuning (measured A/B, SCALE.md round 8): the priced cost is the
    Python state worker crossing Arrow per (state partition ×
    micro-batch). Larger Arrow batches cut the crossing count
    (maxRecordsPerBatch 10k → 1M: ~9.3 → ~7.2 s at sf0.1), and
    state_partitions=8 beats the old 4 by ~2× (6.3 vs 13.5 s same-box:
    more state machines run concurrently; 16 adds nothing over 8 on 32
    cores). Both scoped to the drain, not session-global."""
    from demo_pgvector_spark.session import scoped_conf, scoped_shuffle_partitions

    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    out = funnel_sessions(stream.withWatermark(ts_col, delay))
    out_dir = checkpoint_dir.rstrip("/") + ".out"
    with scoped_shuffle_partitions(spark, state_partitions), scoped_conf(
        spark, "spark.sql.execution.arrow.maxRecordsPerBatch", 1_000_000
    ):
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.schema(out.schema).parquet(out_dir)
