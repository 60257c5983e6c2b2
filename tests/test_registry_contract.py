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
    # -- round-7 plan (SURVEY §2 preamble "Round-7 window rotation";
    # registry.py block comments are the same contract) --
    # (A) new this round (never driver-verified):
    "join_edit_distance", "stream_stateful_funnel", "graph_pagerank",
    "graph_triangles", "graph_bfs", "sample_priority", "layout_zorder",
    "win_sessionize", "vec_mmr_rerank", "ts_resample", "graph_lpa",
    "profile_table", "graph_cc",
    # (B) the nine keys whose latest driver row was round 2 — rotated in
    # FIRST per VERDICT r6 #2:
    "vec_knn_join", "join_asof", "join_range", "agg_cube", "agg_rollup",
    "agg_grouping_sets", "set_intersect", "set_except", "win_rank_topn",
    # (C) implementation changed in round 7 — the carry is voided by the
    # module diff (operators/dedup.py CC fix; streaming/joins.py +
    # late.py file-sink refactor; q_stream_ingest rewrite; the
    # dedup-dependent curate_* composites):
    "dedup_exact", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_embedding", "dedup_ngram", "dedup_containment", "dedup_assign",
    "dedup_semantic", "curate_fuzzy", "curate_corpus",
    "stream_join", "stream_static_join", "stream_join_outer",
    "stream_join_right", "stream_join_full",
    "stream_late_data", "stream_late_update", "stream_ingest",
    # (D) the oldest green carries re-anchor (latest driver row round 4;
    # the sixteen round-4 keys left out — tpch_q3, join_lineitem_orders,
    # tpch_q6, vec_cosine_dist, stream_dedup, stream_windows,
    # filt_predicates, stream_session_windows, text_fingerprint,
    # text_quality, text_lang_id (each displaced when a new round-7 key
    # landed: new keys outrank re-anchoring carries), cluster_kmeans,
    # emb_generate, agg_word_counts, filt_files, sink_stdout — are
    # first in line for round 8):
    "chunk_enrich", "win_chunk_number", "mm_media", "emb_hash_embed",
    "win_running_total", "text_repetition", "agg_pivot", "tpch_q5",
    "str_scalars", "proj_sim_family",
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
