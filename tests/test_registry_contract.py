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
    # -- round-10 plan (SURVEY §2 preamble "Round-10 window rotation";
    # registry.py block comments are the same contract) --
    # (A) new this round (never driver-verified): the four VERDICT r9
    # operators plus the two consolidation composites whose freed
    # slots make the full re-anchor sweep fit:
    "dedup_substring", "retrieval_rrf", "stream_curate",
    "mm_phash_dedup", "set_ops", "agg_multidim",
    # (B) implementation changed in round 10 — a green r9 row does not
    # carry across a diff (stream_countmin: atomic epoch-in-version
    # commit; dedup_url: tracking-param boundary anchoring, oracle
    # changed too; vec_ivf_drift: eager zero-totals guard):
    "stream_countmin", "dedup_url", "vec_ivf_drift",
    # (C) ALL forty-one remaining round-7 rows re-anchor (VERDICT r9
    # #1; the five consolidated slugs set_intersect/set_except/
    # agg_cube/agg_rollup/agg_grouping_sets re-anchor inside (A)'s
    # composites) — nothing in the registry is older than round 8
    # after this sweep. Guard-only diffs no registry input reaches
    # (the bloom_decontaminate both-None ValueError) do not void rows:
    # decon_bloom/stream_bloom/curate_incremental carry r8/r9 green
    # with pytest + targeted-parity cover and re-anchor in r11.
    "dedup_exact", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_embedding", "dedup_ngram", "dedup_containment",
    "dedup_assign", "dedup_semantic", "curate_fuzzy", "curate_corpus",
    "stream_join", "stream_static_join", "stream_join_outer",
    "stream_join_right", "stream_join_full", "stream_late_data",
    "stream_late_update", "stream_ingest", "graph_pagerank",
    "graph_triangles", "graph_cc", "join_edit_distance",
    "stream_stateful_funnel", "vec_knn_join", "join_asof", "join_range",
    "win_rank_topn", "chunk_enrich", "win_chunk_number", "mm_media",
    "emb_hash_embed", "win_running_total", "text_repetition",
    "agg_pivot", "tpch_q5", "str_scalars", "proj_sim_family",
    "layout_zorder", "win_sessionize", "vec_mmr_rerank",
    "profile_table",
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
