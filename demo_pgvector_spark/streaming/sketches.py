"""Streaming sketch/membership rollups: per-micro-batch count-min
sketches merged cell-wise into a versioned sketch table (VERDICT r8
#5), and the eval-set bloom filter maintained the same way by
idempotent bit-OR (``bloom_sink`` below) — the two ingest-maintained
artifacts the batch operators promise.

The batch sketch (operators/sketch.py) is MERGEABLE — two sketches over
disjoint data combine by cell-wise addition into exactly the sketch of
the union (pinned in tests/test_sketch.py). That property IS the
streaming contract: each micro-batch builds its own d×w sketch in one
partial-combining pass, and ``foreachBatch`` folds it into the running
sketch table — constant d×w state regardless of how many events or
epochs have flowed, the per-day/per-stream rollup the sketch family
claims, proven end-to-end here.

Exactly-once story: unlike the ingest upsert (idempotent by
construction), cell-wise ADDITION is not idempotent — a retried epoch
would double-count. ``foreachBatch`` delivers (batch, epoch_id) with a
stable epoch_id across retries, so the sink records the last applied
epoch and SKIPS an epoch it has already folded in — the standard
transactional-sink recipe for non-idempotent merges (documented in the
Structured Streaming programming guide). Storage reuses the
versioned-parquet + atomic-pointer table from streaming/ingest.py,
with one refinement (ADVICE r9): the epoch marker lives INSIDE the
version directory, written after the version's parquet job and before
the pointer swap, so the single ``os.replace`` of the pointer commits
the folded table and its last-applied epoch ATOMICALLY. A crash
anywhere leaves pointer-visible state self-consistent: before the swap
the previous version and its own marker stay live (the retry re-folds
the crashed epoch against the still-previous table — correct, it was
never visible), after the swap the marker already says the epoch is
applied (the retry is a no-op). The earlier root-level marker had a
window between pointer swap and marker write in which a retry would
re-merge an already-committed delta and double-count; the in-directory
marker closes it (crash-injection pinned in tests/test_sketch.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_pgvector_spark.operators import sketch as sketch_ops
from demo_pgvector_spark.streaming import ingest as ingest_ops

SKETCH_SCHEMA_DDL = "r int, bucket bigint, cnt bigint"

_EPOCH_MARKER = "_LAST_EPOCH"


def _last_epoch(root: str) -> int:
    """Last epoch folded into the POINTER-VISIBLE version (the marker is
    committed by the same os.replace that publishes the version — see
    ``_commit_with_epoch``); -1 before the first commit."""
    v = ingest_ops.current_version(root)
    if v is None:
        return -1
    try:
        with open(
            os.path.join(root, v, _EPOCH_MARKER), encoding="utf-8"
        ) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def _commit_with_epoch(df: DataFrame, root: str, epoch_id: int) -> str:
    """``ingest.commit_table``'s write-then-swap with the epoch marker
    written INSIDE the not-yet-visible version directory (an
    underscore-prefixed file, invisible to parquet file discovery like
    ``_SUCCESS``), so the single atomic pointer ``os.replace`` commits
    the table version AND its last-applied epoch together (ADVICE r9:
    a root-level marker written after the swap left a crash window in
    which a retried epoch re-merged an already-live delta and
    double-counted)."""
    v = ingest_ops.current_version(root)
    nxt = f"v{(int(v[1:]) + 1) if v else 1:06d}"
    os.makedirs(root, exist_ok=True)
    # single file: the sketch is ≤ d×w rows by construction — see
    # ingest.commit_table(single_file=True) for the small-files argument
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, nxt))
    with open(
        os.path.join(root, nxt, _EPOCH_MARKER), "w", encoding="utf-8"
    ) as fh:
        fh.write(str(epoch_id))
    tmp = os.path.join(root, f".{ingest_ops._POINTER}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(nxt)
    os.replace(tmp, os.path.join(root, ingest_ops._POINTER))
    return nxt


def countmin_sink(
    root: str,
    item_col: str,
    depth: int = sketch_ops.CM_DEPTH,
    width: int = sketch_ops.CM_WIDTH,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining a running count-min
    sketch table: per epoch, build the micro-batch's own sketch (ONE
    partial-combining aggregate over the batch) and fold it into the
    committed sketch by cell-wise sum — the merge side is always
    ≤ 2·d·w rows, so the fold costs O(sketch), not O(history). An
    already-applied epoch (retry) is skipped via the epoch marker."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        if epoch_id <= _last_epoch(root):
            return  # retried epoch already folded in — addition is not
            # idempotent, so the marker, not the merge, carries safety
        spark = batch.sparkSession
        delta = sketch_ops.countmin_build(batch, item_col, depth, width)
        existing = ingest_ops.read_table(spark, root, SKETCH_SCHEMA_DDL)
        merged = (
            existing.unionByName(delta)
            .groupBy("r", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        _commit_with_epoch(merged, root, epoch_id)

    return apply


def run_countmin_stream(
    stream_df: DataFrame,
    root: str,
    item_col: str,
    checkpoint_dir: str,
    depth: int = sketch_ops.CM_DEPTH,
    width: int = sketch_ops.CM_WIDTH,
    batch_shuffle_partitions: int | None = 8,
) -> None:
    """Drain ``stream_df`` through the count-min sink with an
    availableNow trigger. The per-epoch jobs aggregate into ≤ d·w cells,
    so the default scopes the shuffle narrow (the late-data-row
    argument: session-wide 32 partitions schedule mostly-empty tasks
    for a 1024-cell result); a production deployment drops the trigger
    and the sketch table becomes a continuously-maintained ingest
    artifact queried independently of the stream."""
    from demo_pgvector_spark.streaming.late import _scoped_shuffle_partitions

    with _scoped_shuffle_partitions(
        stream_df.sparkSession, batch_shuffle_partitions
    ):
        q = (
            stream_df.writeStream.foreachBatch(
                countmin_sink(root, item_col, depth, width)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_sketch(spark, root: str) -> DataFrame:
    """The committed sketch relation (empty before the first commit)."""
    return ingest_ops.read_table(spark, root, SKETCH_SCHEMA_DDL)


BLOOM_SCHEMA_DDL = "pos bigint"


def bloom_sink(
    root: str,
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining the eval-set BLOOM filter
    (operators/curation.py bloom_build) as a versioned position table —
    the decontamination index kept current as eval suites land
    nightly, the membership twin of ``countmin_sink``. Per epoch: build
    the micro-batch's own position set and fold by DISTINCT union,
    which IS bit-OR on the m-bit filter (union ≡ bit-OR pinned in
    tests/test_curation.py).

    Exactly-once contrast with the count-min sink: bit-OR is
    IDEMPOTENT — re-setting a set bit changes nothing — so
    at-least-once epoch delivery composes to exactly-once table state
    with NO epoch marker (the upsert-sink argument, not the
    marker recipe); a retried epoch just re-commits an identical
    version. State is ≤ BLOOM_M positions forever."""
    from demo_pgvector_spark.operators import curation as curation_ops

    def apply(batch: DataFrame, _epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = curation_ops.bloom_build(batch, text_col=text_col)
        existing = ingest_ops.read_table(spark, root, BLOOM_SCHEMA_DDL)
        merged = existing.unionByName(delta).distinct()
        # ≤ BLOOM_M positions forever — constant-bounded, single file
        ingest_ops.commit_table(merged, root, single_file=True)

    return apply


def run_bloom_stream(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    batch_shuffle_partitions: int | None = 8,
) -> None:
    """Drain ``stream_df`` through the bloom sink (availableNow trigger;
    the run_countmin_stream shape — narrow scoped shuffle because the
    fold's result is ≤ BLOOM_M narrow rows)."""
    from demo_pgvector_spark.streaming.late import _scoped_shuffle_partitions

    with _scoped_shuffle_partitions(
        stream_df.sparkSession, batch_shuffle_partitions
    ):
        q = (
            stream_df.writeStream.foreachBatch(bloom_sink(root, text_col))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_bloom(spark, root: str) -> DataFrame:
    """The committed bloom position table (empty before first commit)."""
    return ingest_ops.read_table(spark, root, BLOOM_SCHEMA_DDL)


# Default register-table schema for the registry's lineitem demo; a
# different group_cols tuple passes its matching DDL explicitly.
HLL_SCHEMA_DDL = "l_returnflag string, register bigint, rho int"


def hll_sink(
    root: str,
    item_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = sketch_ops.HLL_P,
    schema_ddl: str = HLL_SCHEMA_DDL,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining the HyperLogLog register
    RELATION (operators/sketch.py hll_build) as a versioned table — the
    cardinality member of the ingest-maintained sketch family. Per
    epoch: build the micro-batch's own ≤ m-row register table and fold
    by per-register MAX (max-merge ≡ build-of-union, pinned in
    tests/test_sketch.py).

    Exactly-once contrast, completing the trilogy: count-min cell-ADD
    is not idempotent (epoch marker inside the version directory),
    bloom bit-OR is idempotent, and register MAX is idempotent too — a
    retried epoch re-commits an identical version, so at-least-once
    delivery composes to exactly-once table state with no marker. State
    is ≤ m rows per group forever, regardless of stream length."""

    def apply(batch: DataFrame, _epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = sketch_ops.hll_build(batch, item_col, group_cols, p)
        existing = ingest_ops.read_table(spark, root, schema_ddl)
        merged = (
            existing.unionByName(delta)
            .groupBy(*group_cols, "register")
            .agg(F.max("rho").alias("rho"))
        )
        # ≤ m rows per group forever — constant-bounded, single file
        ingest_ops.commit_table(merged, root, single_file=True)

    return apply


def run_hll_stream(
    stream_df: DataFrame,
    root: str,
    item_col: str,
    checkpoint_dir: str,
    group_cols: tuple[str, ...] = (),
    batch_shuffle_partitions: int | None = 8,
    schema_ddl: str = HLL_SCHEMA_DDL,
) -> None:
    """Drain ``stream_df`` through the HLL sink (availableNow trigger;
    the run_countmin_stream shape — narrow scoped shuffle because the
    fold's result is ≤ m rows per group)."""
    from demo_pgvector_spark.streaming.late import _scoped_shuffle_partitions

    with _scoped_shuffle_partitions(
        stream_df.sparkSession, batch_shuffle_partitions
    ):
        q = (
            stream_df.writeStream.foreachBatch(
                hll_sink(root, item_col, group_cols, schema_ddl=schema_ddl)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_hll(spark, root: str, schema_ddl: str = HLL_SCHEMA_DDL) -> DataFrame:
    """The committed HLL register table (empty before first commit)."""
    return ingest_ops.read_table(spark, root, schema_ddl)
