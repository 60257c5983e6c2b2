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
    # -- round-9 plan (SURVEY §2 preamble "Round-9 window rotation";
    # registry.py block comments are the same contract) --
    # (A) new this round (never driver-verified):
    "stream_countmin", "stream_bloom", "dedup_index_write",
    "dedup_incremental_indexed", "join_skew_adaptive", "vec_ivf_drift",
    "layout_zorder_append", "curate_incremental",
    # (B) the SEVEN keys whose latest driver row was round 5 — the
    # oldest rows in the registry, rotated in FIRST per VERDICT r8 #1
    # (vec_sim_topk is the flagship):
    "vec_sim_topk", "vec_ann_topk", "vec_ann_join", "vec_ivf_topk",
    "vec_pq_topk", "vec_ivfpq_topk", "join_bucketed",
    # (C) implementation changed in round 9 — the green r8 row is
    # voided by the diff (url_canonicalize semantics rewrite; the
    # incremental self-pair guard; ts_interpolate's display contract
    # became the engine-independent floor-scale BIGINT after the 10x
    # replica gate caught a DuckDB double-ROUND midpoint divergence):
    "dedup_url", "dedup_incremental", "ts_interpolate",
    # (D) all thirty-two round-6-green carries re-anchor — after this
    # sweep nothing in the registry is staler than round 7:
    "agg_context_concat", "chunk_bpe", "chunk_bpe_pretrained",
    "chunk_docling", "classify_source_type", "extract_year",
    "ins_chunk_txn", "join_skew_salted", "json_metadata", "meta_sidecar",
    "pack_sequences", "rag_prompts", "sample_mixture",
    "sample_stratified", "src_convert_epub", "src_route",
    "text_bm25_topk", "text_decontaminate", "text_keywords",
    "text_perplexity", "text_quality_model", "text_scrub", "tpch_q12",
    "tpch_q20", "tpch_q8", "tpch_q9", "upsert_model", "upsert_source",
    "vec_ivf_pruned", "vec_ivf_trained", "vec_ivfpq_pruned",
    "win_range_numeric",
    # (no (E) re-anchors this round: all four candidate r7 slots went
    # to the new keys and the re-verifying ts_interpolate — new/changed
    # keys outrank re-anchoring carries; join_edit_distance,
    # stream_stateful_funnel, graph_pagerank and graph_triangles hold
    # green r7 rows at positions 51-54)
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
