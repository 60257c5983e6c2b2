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
