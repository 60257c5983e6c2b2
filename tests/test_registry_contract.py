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
    # -- round-8 plan (SURVEY §2 preamble "Round-8 window rotation";
    # registry.py block comments are the same contract) --
    # (B) the SIXTEEN keys whose latest driver row was round 4 — four
    # rounds stale, rotated in FIRST per VERDICT r7 #1:
    "stream_windows", "filt_predicates", "stream_session_windows",
    "text_fingerprint", "text_quality", "text_lang_id",
    "join_lineitem_orders", "tpch_q6", "vec_cosine_dist", "stream_dedup",
    "tpch_q3", "cluster_kmeans", "emb_generate", "agg_word_counts",
    "filt_files", "sink_stdout",
    # (C) implementation/oracle changed in round 8 — the green r7 row
    # is voided by the diff (timeseries.py step guard; curation.py
    # integer-div priority; graph.py LPA tie-break; BFS oracle
    # self-loop filter):
    "ts_resample", "sample_priority", "graph_lpa", "graph_bfs",
    # (D) the oldest green carries re-anchor (latest driver row round
    # 5). Round-7-green keys (the 13 r7-new + the re-verified dedup/
    # stream/curate families) carry at 51+ under the unchanged-code
    # rule. The YOUNGEST (D) entries yield slots as new round-8 keys
    # land (new keys outrank re-anchoring carries), so only the oldest
    # core is pinned here:
    "tpch_q1", "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q10", "tpch_q11",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
    "win_range_frame", "seq_funnel", "agg_percentiles",
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
