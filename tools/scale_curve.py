"""Scaling-curve runner: time a set of registry keys at several data
scales and print one JSON object per scale plus per-key growth ratios.

Usage:
    python tools/scale_curve.py DIR [DIR ...]
        [--keys k1,k2,...] [--label L1,L2,...]

The key set defaults to the scale-safe bench subset: the two
output-quadratic dedup rows (dedup_minhash_pairs, dedup_embedding) are
excluded because replicated corpora multiply their RESULT size
quadratically (every replica pair is a true near-dup), which measures
output volume, not operator scaling — SCALE.md discusses them
separately. Use --keys to override.

A 10×/30× replica is built with the SCALE.md recipe (small row groups +
SPARK_GRAFT_MAX_PARTITION_BYTES=8m so the scanner can actually split
single local files; without that, document-bound ops serialize on one
task and look 13-19× instead of ~3×).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = (
    "vec_sim_topk", "vec_knn_join", "rag_prompt_context",
    "upsert_source", "ins_chunk_txn",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "join_lineitem_orders",
    "vec_ann_topk", "vec_pq_topk", "vec_ivfpq_topk", "vec_ivf_topk", "cluster_kmeans", "join_asof",
    "emb_hash_embed", "dedup_exact", "text_fingerprint", "text_quality",
    "text_repetition", "chunk_enrich", "chunk_bpe",
    "stream_window_counts", "stream_session_windows",
    "mm_decode_image", "agg_word_counts",
    # round-4 additions: the relational tail + the streaming write path.
    # dedup_assign is excluded like the pair rows — its INPUT (the pair
    # graph) grows quadratically on replicated corpora.
    "agg_pivot", "agg_percentiles", "agg_cube", "agg_rollup",
    "agg_grouping_sets", "set_intersect", "set_except",
    "win_rank_topn", "win_running_total", "join_range",
    "stream_ingest",
    # round-4 curation pair: both output-linear (per-doc counts / fixed
    # top-k), so replica scaling measures the operators, not the output.
    # (curate_corpus and sample_stratified are oracle-gated at every
    # scale but excluded here: exact-dedup keepers collapse replicated
    # corpora, so their replica curve measures output shrinkage.)
    "text_decontaminate", "text_perplexity", "text_bm25_topk",
    # late round-4 additions: the scrub projection, the Q18 screen, the
    # salted skew join, and the bucketed-layout join (write+read; its
    # time is write-dominated by design — the curve shows the ingest
    # cost scaling linearly while the join stays exchange-free).
    "text_scrub", "tpch_q18", "join_skew_salted", "join_bucketed",
    # round-5 additions: the TPC-H plan-feature set, mixture sampling
    # and the watermark stream. dedup_ngram is excluded like the other
    # pair rows — replicated corpora multiply its RESULT quadratically.
    "tpch_q4", "tpch_q7", "tpch_q10", "tpch_q14", "tpch_q16",
    "tpch_q17", "tpch_q19", "tpch_q22", "sample_mixture",
    "stream_late_data",
    # final round-5 pass (curate_fuzzy excluded like curate_corpus:
    # replica dedup shrinks its output, measuring shrinkage not scaling)
    "tpch_q2", "tpch_q11", "tpch_q13", "tpch_q15", "tpch_q21",
    "text_keywords", "win_range_frame", "seq_funnel",
    # round-6 additions: the TPC-H completions, the pretrained-vocab BPE
    # row, the numeric RANGE frame, and the UPDATE-mode stream
    # (dedup_containment is excluded like dedup_ngram — replicated
    # corpora multiply its ORDERED-pair result quadratically).
    "tpch_q8", "tpch_q9", "tpch_q12", "tpch_q20",
    "chunk_bpe_pretrained", "win_range_numeric", "stream_late_update",
    # late round-6: the model-based quality filter (per-doc linear scan —
    # replica-safe; dedup_semantic is excluded like the other pair rows:
    # replicated embeddings make every replica pair a true semantic dup,
    # so its result — and the CC edge graph — grows quadratically).
    "text_quality_model",
    "vec_ivf_trained",
    "stream_join",
    "stream_static_join",
    "stream_join_outer",
    "stream_join_right",
    "stream_join_full",
    # round-7 additions. The graph keys' DISTINCT edge sets are
    # replica-invariant (dims stay 1×), so their curves price the
    # scan+dedup front end; win_sessionize is result-volume-bound like
    # win_running_total (returns every event); ts_resample's grid grows
    # with the replicated user set. join_edit_distance is EXCLUDED (its
    # input is the unreplicated customer dim — the curve would be flat
    # by construction, measuring nothing).
    "graph_pagerank", "graph_triangles", "graph_bfs", "graph_lpa",
    "sample_priority", "layout_zorder", "win_sessionize",
    "vec_mmr_rerank", "ts_resample", "stream_stateful_funnel",
    # round-10 additions. retrieval_rrf is fixed top-10 (replica-safe:
    # the curve prices the two retrieval scans). dedup_substring is
    # EXCLUDED like the other pair rows — replicated corpora make every
    # replica pair share full-length runs, output quadratic.
    # stream_curate and mm_phash_dedup are excluded: the stream key's
    # staged batch audit inherits curate_incremental's replica-pair
    # quadratics, and the phash corpus is a fixed doc_id<200 slice (a
    # flat curve would measure nothing).
    "retrieval_rrf",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--keys", default=",".join(DEFAULT_KEYS))
    ap.add_argument("--labels", default=None)
    ap.add_argument(
        "--reps", type=int, default=1,
        help="runs per key; the MEDIAN is reported (use >=3 on shared "
        "machines — single samples are hostage to GC pauses and "
        "neighbor load)",
    )
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]
    labels = args.labels.split(",") if args.labels else args.dirs

    from statistics import median

    from demo_pgvector_spark import registry
    from demo_pgvector_spark.session import get_session

    spark = get_session("scale_curve")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for label, d in zip(labels, args.dirs):
        registry.REGISTRY["vec_sim_topk"][0](spark, d).collect()  # warm
        t: dict[str, float] = {}
        for key in keys:
            entry = registry.REGISTRY.get(key)
            fn = entry[0] if entry else getattr(registry, f"q_{key}")
            samples = []
            for _ in range(max(1, args.reps)):
                t0 = time.time()
                fn(spark, d).collect()
                samples.append(time.time() - t0)
            t[key] = round(median(samples), 3)
            # Long single-session multi-scale runs accumulate
            # localCheckpoint blocks and collected-result refs (the same
            # driver-heap exhaustion class tools/parity.py hit on the
            # 30× sweep); force the Python side so the ContextCleaner
            # can actually free them between keys.
            gc.collect()
        results[label] = t
        print(json.dumps({"scale": label, "total": round(sum(t.values()), 2),
                          "queries": t}), flush=True)

    if len(labels) > 1:
        base = results[labels[0]]
        ratios = {
            k: {lb: round(results[lb][k] / base[k], 2) for lb in labels[1:]}
            for k in keys
        }
        print(json.dumps({"ratios_vs_" + labels[0]: ratios}), flush=True)


if __name__ == "__main__":
    main()
