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
    # -- round-13 plan (SURVEY §2 preamble "Round-13 window rotation
    # (PRECOMPUTED in round 12)", VERDICT r12 #1; registry.py block
    # comments are the same contract). 3 + 23 + 24 = 50 exactly. --
    # (A) the THREE round-12 graph-ANN additions with no driver row
    # yet (new-keys-first):
    "vec_hnsw_topk", "vec_hnsw_append", "stream_hnsw_ingest",
    # (B) the TWENTY-THREE r9 residue rows, first-in-line since the
    # r12 precomputation:
    "meta_sidecar", "pack_sequences", "rag_prompts", "sample_mixture",
    "sample_stratified", "src_convert_epub", "src_route",
    "text_bm25_topk", "text_decontaminate", "text_keywords",
    "text_perplexity", "text_quality_model", "text_scrub", "tpch_q12",
    "tpch_q20", "tpch_q8", "tpch_q9", "upsert_model", "upsert_source",
    "vec_ivf_pruned", "vec_ivf_trained", "vec_ivfpq_pruned",
    "win_range_numeric",
    # (C) TWENTY-FOUR of the forty-nine r10 rows re-anchoring, in
    # their registry (= r10 window) order:
    "dedup_substring", "retrieval_rrf", "stream_curate",
    "mm_phash_dedup", "set_ops", "agg_multidim", "stream_countmin",
    "dedup_url", "vec_ivf_drift", "dedup_exact", "dedup_minhash_pairs",
    "dedup_simhash", "dedup_embedding", "dedup_ngram", "dedup_assign",
    "dedup_semantic", "curate_fuzzy", "curate_corpus", "stream_join",
    "stream_static_join", "stream_join_outer", "stream_join_right",
    "stream_join_full", "stream_late_data",
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
