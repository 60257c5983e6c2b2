"""Semantic tests for text analysis (functions/textstats.py) on real
multilingual samples — the testdata's synthetic vocabulary is
language-uniform, so classification quality is only visible here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.functions import textstats

SAMPLES = [
    (0, "the cat sat on the mat and it is happy in the sun", "en"),
    (1, "der hund und die katze sind nicht in das haus", "de"),
    (2, "le chat est dans la maison et les oiseaux dans une cage", "fr"),
    (3, "el perro y la casa que es un lugar en los campos", "es"),
    (4, "我 的 猫 是 在 家 里 和 我 不 出去", "zh"),
]


@pytest.fixture(scope="module")
def samples_df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string, truth string")


def test_lang_id_classifies_real_samples(samples_df):
    out = samples_df.select(
        "truth", textstats.lang_id(F.col("text")).alias("pred")
    ).collect()
    for r in out:
        assert r["pred"] == r["truth"], r


def test_lang_id_unknown_on_no_markers(spark):
    df = spark.createDataFrame([(0, "zzz qqq xxx")], "i long, text string")
    assert df.select(textstats.lang_id(F.col("text"))).first()[0] == "unknown"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "i long, text string",
    )
    fps = [r[0] for r in df.select(textstats.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[2]  # deterministic
    assert fps[0] != fps[1]  # order matters (unlike MinHash)


def test_quality_score_rewards_real_prose(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is a happy cat in the warm sun "
                "near the old door of the house while the birds sing"),
            (1, "!!! ### $$$ %%% ^^^ &&&"),
        ],
        "i long, text string",
    )
    rows = df.select("i", F.round(textstats.quality_score(F.col("text")), 4).alias("q")).collect()
    q = {r["i"]: r["q"] for r in rows}
    assert q[0] > 0.6 > q[1]
    assert 0.0 <= q[1] <= 1.0


def test_token_counts_consistency(spark):
    df = spark.createDataFrame([(0, "Hello, world! This is a test.")], "i long, text string")
    ws, bpe, est = textstats.token_counts(F.col("text"))
    r = df.select(ws.alias("ws"), bpe.alias("bpe"), est.alias("est")).first()
    assert r["ws"] == 6
    assert r["bpe"] == 9  # 6 words + 3 punctuation marks
    assert r["est"] == 8  # ceil(29/4)


def test_repetition_flags_boilerplate_not_prose(spark):
    rows = [
        (0, "buy now " * 40),                       # 50% dup bigrams, stuffing
        (1, "the quick brown fox jumps over the lazy dog while rain falls"),
        (2, "line one\nline one\nline one\nline two"),  # duplicated lines
        (3, ""),                                     # empty: all fractions 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = textstats.repetition_components(F.col("text"))
    got = {
        row["doc_id"]: row
        for row in df.select(
            "doc_id",
            *[c.alias(n) for n, c in r.items()],
            textstats.repetition_flag(F.col("text")).alias("flagged"),
        ).collect()
    }
    assert got[0]["flagged"] and got[0]["dup_bigram_frac"] > 0.9
    assert not got[1]["flagged"] and got[1]["dup_trigram_frac"] == 0.0
    # "the" repeats once in doc 1: 12 tokens, 11 distinct
    assert abs(got[1]["dup_unigram_frac"] - 1 / 12) < 1e-9
    assert got[2]["flagged"] and abs(got[2]["dup_line_frac"] - 0.5) < 1e-9
    assert not got[3]["flagged"]
    assert got[3]["dup_unigram_frac"] == got[3]["dup_line_frac"] == 0.0


def test_repetition_short_docs_have_empty_ngram_sets(spark):
    df = spark.createDataFrame([(0, "solo"), (1, "two words")], "doc_id long, text string")
    r = textstats.repetition_components(F.col("text"))
    rows = {x["doc_id"]: x for x in df.select(
        "doc_id", *[c.alias(n) for n, c in r.items()]
    ).collect()}
    assert rows[0]["dup_bigram_frac"] == 0.0   # < n tokens -> empty grams
    assert rows[1]["dup_trigram_frac"] == 0.0
