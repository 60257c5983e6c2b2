"""The streaming CURATION tick (VERDICT r9 #4): ``curate_incremental``
(operators/curation.py) wired as the ``foreachBatch`` consumer of the
versioned ingest — the daily-batch audit running as a real
``readStream`` → drain instead of a batch function call. This closes
the production loop over the round-8/9 maintenance artifacts: docs
land as stream files, and every epoch re-audits the staged day-batch
against the incumbent corpus, the materialized band index, and the
eval bloom, committing the verdict table the pipeline logs per tick.

Two versioned tables under one root (streaming/ingest.py storage):

- ``staged/`` — the day-batch accumulated so far, grown per epoch by
  an anti-join upsert (idempotent: a retried epoch stages nothing new
  and re-commits an identical version — the upsert-sink argument, no
  epoch marker needed);
- ``verdicts/`` — ``curate_incremental(corpus, staged, eval)``
  recomputed over the FULL staged batch each epoch and committed
  whole.

Recomputing over the staged whole (not the epoch slice) is what makes
the result EPOCH-SPLIT-INVARIANT: the within-batch verdicts (the
smaller-id exact/near-dup twin rules) need the entire day-batch, so
auditing per-slice would tie the output to arrival order. The audit is
O(staged) + index scans by construction — the corpus is never
re-banded, the bloom never rebuilt — so an E-epoch day costs E small
audits, and the FINAL table is bit-identical to the one-shot batch
call: the registry row drains three files through this sink and shares
``O_CURATE_INCREMENTAL`` verbatim, proving stream ≡ batch end to end
(the stream_bloom recipe, one level up the stack).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from demo_pgvector_spark.operators import curation as curation_ops
from demo_pgvector_spark.streaming import ingest as ingest_ops

STAGE_SCHEMA_DDL = "doc_id bigint, text string"
VERDICT_SCHEMA_DDL = (
    "doc_id bigint, exact_dup boolean, too_short boolean, "
    "near_dup boolean, contaminated boolean, kept boolean"
)


def curate_sink(
    root: str,
    corpus: DataFrame,
    eval_docs: DataFrame,
    corpus_bands: DataFrame | None = None,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining the day-batch audit: per
    epoch, stage the slice (anti-join upsert on doc_id), then recompute
    ``curate_incremental`` over the full staged batch and commit the
    verdict table. Both commits are idempotent re-runs on a retried
    epoch; a crash between them is repaired by the retry."""

    stage_root = os.path.join(root, "staged")
    verdict_root = os.path.join(root, "verdicts")

    def apply(batch: DataFrame, _epoch_id: int) -> None:
        spark = batch.sparkSession
        staged = ingest_ops.read_table(spark, stage_root, STAGE_SCHEMA_DDL)
        fresh = batch.select("doc_id", "text").join(
            staged.select("doc_id"), "doc_id", "left_anti"
        )
        # the staged day-batch is GROW-ONLY: add-files commit writes
        # the slice, hardlinks the rest (O(slice), not O(day) per epoch)
        ingest_ops.commit_table(fresh, stage_root, delta=True)
        staged_now = ingest_ops.read_table(
            spark, stage_root, STAGE_SCHEMA_DDL
        )
        verdicts = curation_ops.curate_incremental(
            corpus, staged_now, eval_docs, corpus_bands=corpus_bands
        )
        ingest_ops.commit_table(verdicts, verdict_root)

    return apply


def run_curate_stream(
    stream_df: DataFrame,
    root: str,
    corpus: DataFrame,
    eval_docs: DataFrame,
    checkpoint_dir: str,
    corpus_bands: DataFrame | None = None,
    batch_shuffle_partitions: int | None = 8,
) -> None:
    """Drain ``stream_df`` through the curation sink (availableNow
    trigger, narrow scoped shuffle — the run_countmin_stream shape: the
    per-epoch audit output is one row per staged doc)."""
    from demo_pgvector_spark.streaming.late import _scoped_shuffle_partitions

    with _scoped_shuffle_partitions(
        stream_df.sparkSession, batch_shuffle_partitions
    ):
        q = (
            stream_df.writeStream.foreachBatch(
                curate_sink(root, corpus, eval_docs, corpus_bands)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_verdicts(spark: SparkSession, root: str) -> DataFrame:
    """The committed verdict table (empty before the first epoch)."""
    return ingest_ops.read_table(
        spark, os.path.join(root, "verdicts"), VERDICT_SCHEMA_DDL
    )
