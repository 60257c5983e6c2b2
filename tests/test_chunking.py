"""Property tests for the deterministic chunker (operators/chunking.py):
splitting must be lossless, bounded, and contiguously numbered."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.operators import chunking

DOCS = [
    (0, "one two three four five six seven", "en", "web"),
    (1, "a b c d", "en", "pdf"),
    (2, "solo", "de", "web"),
    (3, " ".join(f"w{i}" for i in range(100)), "fr", "epub"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string, source string")


def test_chunks_reassemble_to_original(docs_df):
    out = (
        chunking.chunk_split(docs_df, max_tokens=3)
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("chunk_number", "chunk_text"))).getField("chunk_text")).alias("rejoined"))
    )
    got = {r["doc_id"]: r["rejoined"] for r in out.collect()}
    for doc_id, text, *_ in DOCS:
        assert got[doc_id] == text, doc_id


def test_chunk_token_bound(docs_df):
    rows = chunking.chunk_split(docs_df, max_tokens=3).collect()
    for r in rows:
        assert 1 <= len(r["chunk_text"].split(" ")) <= 3
    # only the LAST chunk of a doc may be short
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_number"])
        for c in chunks[:-1]:
            assert len(c["chunk_text"].split(" ")) == 3


def test_chunk_numbers_contiguous(docs_df):
    rows = chunking.chunk_split(docs_df, max_tokens=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_number"])
    for nums in by_doc.values():
        assert sorted(nums) == list(range(len(nums)))


def test_enrich_merges_constants_and_doc_metadata(docs_df):
    rows = chunking.chunk_enrich(docs_df, max_tokens=3).filter(F.col("doc_id") == 0).collect()
    for r in rows:
        m = r["metadata"]
        assert m["lang"] == "en" and m["source"] == "web"
        assert m["chunk_size"] == "3"
        assert m["chunk_number"] == str(r["chunk_number"])
        assert m["chunk_tokenizer_model"] == chunking.DEFAULT_TOKENIZER_MODEL
        assert m["import_date"] == chunking.FIXED_IMPORT_DATE


def test_windowed_numbering_matches_posexplode(docs_df):
    w = chunking.chunk_numbers_windowed(docs_df, max_tokens=3)
    for r in w.collect():
        assert r["chunk_number_w"] == r["token_offset"] // 3


def test_chunk_bpe_budget_and_reconstruction(spark, docs_df):
    """Every chunk's subword-token load stays within budget+max_piece_cost,
    chunk numbers are contiguous from 0, and the space-joined chunk texts
    reconstruct the full piece stream in order."""
    import re

    budget = 12
    out = chunking.chunk_bpe(docs_df, max_bpe_tokens=budget)
    rows = out.orderBy("doc_id", "chunk_number").collect()
    texts = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        pieces = re.findall(r"\w+|[^\w\s]", texts[doc_id])
        max_cost = max(-(-len(p) // 4) for p in pieces)
        assert [c["chunk_number"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["n_bpe_tokens"] <= budget + max_cost - 1
        assert " ".join(c["chunk_text"] for c in chunks) == " ".join(pieces)
        # total cost conserved across chunks
        assert sum(c["n_bpe_tokens"] for c in chunks) == sum(
            -(-len(p) // 4) for p in pieces
        )


def test_chunk_bpe_long_words_cost_more(spark):
    """A doc of long words must split into more chunks than one of short
    words with the same word count — the point of subword budgeting."""
    docs = spark.createDataFrame(
        [(0, " ".join(["internationalization"] * 12)),
         (1, " ".join(["cat"] * 12))],
        "doc_id long, text string",
    )
    out = chunking.chunk_bpe(docs, max_bpe_tokens=12)
    n = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").count()
         .withColumnRenamed("count", "n").collect()}
    assert n[0] > n[1]


def test_bpe_udf_matches_catalyst_cost_model(spark, docs_df):
    """The pandas_udf tokenizer slot must produce exactly the pieces and
    costs the Catalyst chunk_bpe expression computes — the contract that
    lets a real HF tokenizer drop in without touching the packing.
    Includes a non-ASCII doc: Java/RE2 \\w is ASCII, so the UDF must use
    re.ASCII or CJK text silently diverges."""
    docs_df = docs_df.select("doc_id", "text").union(
        spark.createDataFrame(
            [(9001, "mixed 内国 text αβ done"), (9002, "naïve café ok")],
            "doc_id long, text string",
        )
    )
    udf_rows = docs_df.select(
        "doc_id", chunking.bpe_costs_udf()(F.col("text")).alias("tc")
    ).select("doc_id", "tc.pieces", "tc.costs").collect()
    cat_rows = (
        docs_df.select(
            "doc_id",
            F.expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)").alias("pieces"),
        )
        .select(
            "doc_id",
            "pieces",
            F.expr("transform(pieces, p -> cast(ceil(length(p) / 4.0) as bigint))").alias("costs"),
        )
        .collect()
    )
    udf = {r["doc_id"]: (r["pieces"], r["costs"]) for r in udf_rows}
    cat = {r["doc_id"]: (r["pieces"], r["costs"]) for r in cat_rows}
    assert udf == cat
