"""Driver-contract regression tests for the registry itself.

Two failure modes cost a whole verification round each when they reach
the driver, so they are pinned here:

1. The driver's canonicalizer hashes results with a pandas sort over
   cell VALUES — an array/map/struct column raises ``unhashable type``
   and voids the key's verdict (r2 lost emb_hash_embed/emb_generate to
   an array<double> column). Every registry query must emit scalar
   columns only.
2. The driver records CORRECTNESS rows for exactly the FIRST 50
   registry entries (r1: 19/19, r2: 50 of 74). The 50-slot head must
   contain every SURVEY §2 item and every LLM-pipeline pillar operator;
   a key appended carelessly could silently push one past the window.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from demo_pgvector_spark import registry

SF = "/root/testdata/sf0.001"

# Keys that MUST sit inside the driver's 50-row correctness window this
# round: the current rotation plan (new keys, diff-invalidated carries,
# then the oldest green rows re-anchoring) — SURVEY §2 preamble and the
# registry.py block comments state the same contract. §2-surface keys
# not listed here carry green rows ≤ 2 rounds old under the
# unchanged-code rule and are still parity-verified locally every round.
WINDOW_REQUIRED = {
    # -- round-12 plan (SURVEY §2 preamble "Round-12 window rotation
    # (PRECOMPUTED)", VERDICT r11 #1; registry.py block comments are
    # the same contract). 6 + 20 + 6 + 7 + 2 + 9 = 50 exactly. --
    # (A) the SIX round-11 past-window additions with no driver row
    # yet (new-keys-first; ts_ewma's display moved to the floor-micro
    # ewma_e6 contract this round, before its first row):
    "ts_ewma", "graph_hits", "graph_hyperball", "dedup_lines",
    "vec_bq_topk", "sample_temperature",
    # (B) the TWENTY r8-stale first-in-line rows (17 TPC-H +
    # sink_stdout + the agg_word_counts/filt_files pair deferred out
    # of the executed r11 window):
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q6", "tpch_q7",
    "tpch_q10", "tpch_q11", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21",
    "tpch_q22", "sink_stdout", "agg_word_counts", "filt_files",
    # (C) the SIX r9-new keys without a later driver row:
    "stream_bloom", "dedup_index_write", "dedup_incremental_indexed",
    "join_skew_adaptive", "layout_zorder_append", "curate_incremental",
    # (D) the SEVEN then-r5-stale vector/join serving keys (r9 rows):
    "vec_sim_topk", "vec_ann_topk", "vec_ann_join", "vec_ivf_topk",
    "vec_pq_topk", "vec_ivfpq_topk", "join_bucketed",
    # (E) the TWO r9-changed keys without an r10 row:
    "dedup_incremental", "ts_interpolate",
    # (F) the first NINE of the thirty-two r9 (D) carries:
    "agg_context_concat", "chunk_bpe", "chunk_bpe_pretrained",
    "chunk_docling", "classify_source_type", "extract_year",
    "ins_chunk_txn", "join_skew_salted", "json_metadata",
}


def test_all_queries_emit_scalar_columns_only(spark):
    offenders = {}
    for key, (fn, _sql) in registry.REGISTRY.items():
        schema = fn(spark, SF).schema
        bad = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, offenders


def test_survey_and_pillar_keys_fit_the_50_row_window():
    head = list(registry.REGISTRY)[:50]
    missing = WINDOW_REQUIRED - set(head)
    assert not missing, f"pushed past the correctness window: {sorted(missing)}"


def test_every_key_has_an_oracle():
    # rows-only keys would silently downgrade the correctness verdict;
    # since round 3 every key (including cluster_kmeans) carries SQL.
    rows_only = [k for k, (_fn, sql) in registry.REGISTRY.items() if sql is None]
    assert rows_only == [], rows_only
