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


def test_vector_ops_null_semantics(spark):
    """NULL / empty / zero / dim-mismatched vectors must yield NULL
    similarity (never a crash or a fake 0.0) and pass through
    normalization unchanged where the norm is 0."""
    from pyspark.sql import types as T

    from demo_pgvector_spark.functions.vector import cosine_similarity, dot, l2_normalize

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, []), (3, [0.0, 0.0])],
        T.StructType(
            [
                T.StructField("i", T.LongType()),
                T.StructField("v", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    q = F.array(F.lit(1.0), F.lit(0.0))
    got = {r["i"]: r["c"] for r in df.select("i", cosine_similarity(F.col("v"), q).alias("c")).collect()}
    assert got[0] == pytest.approx(1.0 / 5**0.5)
    assert got[1] is None and got[2] is None and got[3] is None
    mism = df.filter(F.col("i") == 0).select(dot(F.col("v"), F.array(F.lit(1.0))).alias("d")).first()
    assert mism["d"] is None  # dim mismatch → NULL, not a partial sum
    assert df.filter(F.col("i") == 3).select(l2_normalize(F.col("v")).alias("n")).first()["n"] == [0.0, 0.0]


def test_upsert_empty_batch_is_identity(spark):
    from demo_pgvector_spark import tables as tb
    from demo_pgvector_spark.operators import write as w

    existing = spark.createDataFrame([(1, "m1", 64)], tb.MODELS_SCHEMA)
    empty = spark.createDataFrame([], "name string, embedding_dim int")
    assert [tuple(r) for r in w.upsert_models(existing, empty).collect()] == [(1, "m1", 64)]


def test_embedding_handles_edges(edge_df):
    from demo_pgvector_spark.functions.embedding import hash_embed

    rows = edge_df.select(hash_embed(F.col("text"), dim=8).alias("e")).collect()
    assert all(len(r["e"]) == 8 for r in rows)


def test_group_ranked_is_exact_global_rank(spark):
    """group_ranked (the distributed order-statistics building block)
    must produce, per group, a permutation of 0..n-1 whose rank order
    agrees with value order — on skewed group sizes, duplicate values,
    and a group smaller than the partition count."""
    import random

    from demo_pgvector_spark.operators import relational as rel

    rng = random.Random(7)
    rows = [("big", float(rng.randint(0, 50))) for _ in range(5000)]
    rows += [("small", float(v)) for v in (3.0, 1.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = rel.group_ranked(df, keys=("g",), value_col="v").collect()

    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["g"], []).append((r["rn"], r["v"], r["n"]))
    assert set(by_group) == {"big", "small"}
    for g, items in by_group.items():
        n = len(items)
        assert all(i[2] == n for i in items)           # group size column
        assert sorted(i[0] for i in items) == list(range(n))  # 0..n-1, no gaps
        ordered = [v for _rn, v, _n in sorted(items)]
        assert ordered == sorted(ordered)              # rank order = value order


def test_scoped_conf_unsets_previously_absent_key(spark):
    """ADVICE r8: scoped_conf must RESTORE absence — a key with no prior
    value (and no session default) is unset after the block, not leaked."""
    from demo_pgvector_spark.session import scoped_conf

    key = "spark.sql.optimizer.excludedRules"  # settable, no default
    assert spark.conf.get(key, None) is None
    with scoped_conf(spark, key, "org.example.NoSuchRule"):
        assert spark.conf.get(key, None) == "org.example.NoSuchRule"
    assert spark.conf.get(key, None) is None

    # and a key WITH a prior value is restored to it
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_conf(spark, "spark.sql.shuffle.partitions", "3"):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_substring_pairs_short_and_boundary_docs(spark):
    """Docs shorter than the gram length contribute nothing; a doc of
    EXACTLY gram_l tokens contributes one gram (an identical twin pair
    reports span_len == gram_l); an empty-overlap corpus yields zero
    rows without error."""
    from demo_pgvector_spark.operators import dedup

    exact = " ".join(f"e{i}" for i in range(12))
    rows = [
        (1, "short doc"),
        (2, exact),
        (3, exact),
        (4, " ".join(f"u{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in dedup.substring_pairs(df, gram_l=12).collect()
    ]
    assert out == [(2, 3, 0, 0, 12)]
    none = spark.createDataFrame(rows[:1], "doc_id long, text string")
    assert dedup.substring_pairs(none, gram_l=12).count() == 0


def test_rrf_fuse_rejects_empty_and_handles_single_list(spark):
    from demo_pgvector_spark.operators import retrieval

    with pytest.raises(ValueError, match="at least one rank list"):
        retrieval.rrf_fuse({})
    one = spark.createDataFrame([(5, 1), (9, 2)], "doc_id long, rank int")
    got = [
        (r["doc_id"], r["rrf_scaled"])
        for r in retrieval.rrf_fuse({"only": one}, topk=5).collect()
    ]
    assert got == [(5, 1_000_000_000 // 61), (9, 1_000_000_000 // 62)]


def test_phash_pairs_empty_and_identical_media(spark):
    from demo_pgvector_spark.operators import multimodal as mm

    empty = spark.createDataFrame([], "doc_id long, content binary")
    assert mm.phash_pairs(empty).count() == 0
    blob = b"IMG|16|16|" + bytes(range(256))
    two = spark.createDataFrame(
        [(1, blob), (2, blob)], "doc_id long, content binary"
    )
    [r] = mm.phash_pairs(two).collect()
    assert (r["id_a"], r["id_b"], r["hamming"]) == (1, 2, 0)


def test_profile_corr_matches_numpy(spark):
    """registry q_profile_corr: the integer-moment Pearson r must match
    numpy.corrcoef on the same data to 6dp."""
    import numpy as np

    from demo_pgvector_spark import registry, tables

    sf = "/root/testdata/sf0.001"
    got = {
        r["pair"]: r["corr_r"]
        for r in registry.q_profile_corr(spark, sf).collect()
    }
    li = tables.load(spark, sf, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).toPandas()
    cols = {
        "quantity_price": ("l_quantity", "l_extendedprice"),
        "quantity_discount": ("l_quantity", "l_discount"),
        "price_discount": ("l_extendedprice", "l_discount"),
    }
    for pair, (a, b) in cols.items():
        want = float(np.corrcoef(li[a], li[b])[0, 1])
        assert abs(got[pair] - want) < 1e-6, (pair, got[pair], want)
