"""Edge-input robustness: every text operator must handle documents
shorter than its window/shingle size, empty strings, and punctuation-only
content without raising (Spark 4 runs ANSI mode — silent int/0 or
descending-sequence bugs become hard failures at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.functions import textstats
from demo_pgvector_spark.operators import chunking, convert, dedup

EDGE_DOCS = [
    (0, "only three words"),
    (1, ""),
    (2, "a"),
    (3, "!!! ??? ..."),
    (4, "word " * 3 + "word"),  # repeated tokens, 4 total
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id long, text string").cache()


def test_shingles_short_doc_fallback(edge_df):
    sh = {r["doc_id"]: r["shingles"] for r in dedup.with_shingles(edge_df).collect()}
    assert sh[0] == ["only three words"]  # whole text as the single shingle
    assert sh[1] == [""]
    assert all(len(v) >= 1 for v in sh.values())


def test_minhash_and_pairs_handle_edges(edge_df):
    assert dedup.minhash_signatures(edge_df).count() == 5
    dedup.minhash_pairs(edge_df).collect()  # must not raise


def test_simhash_handles_edges(edge_df):
    rows = dedup.simhash(edge_df).collect()
    assert len(rows) == 5


def test_chunker_handles_edges(edge_df):
    rows = chunking.chunk_split(edge_df, max_tokens=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert by_doc[1] == [""]
    assert by_doc[2] == ["a"]


def test_convert_handles_edges(edge_df):
    assert convert.convert_epub(convert.fake_epubs(edge_df)).count() == 5


def test_textstats_handle_edges(edge_df):
    out = edge_df.select(
        "doc_id",
        textstats.lang_id(F.col("text")).alias("lang"),
        F.round(textstats.quality_score(F.col("text")), 4).alias("q"),
        textstats.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    for r in out:
        assert r["lang"] is not None
        assert 0.0 <= r["q"] <= 1.0
        assert r["fp"] is not None


def test_embedding_handles_edges(edge_df):
    from demo_pgvector_spark.functions.embedding import hash_embed

    rows = edge_df.select(hash_embed(F.col("text"), dim=8).alias("e")).collect()
    assert all(len(r["e"]) == 8 for r in rows)
