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


def _py_gopher(text: str) -> dict:
    """Plain-Python reference for the Gopher rules (integer math only),
    mirroring functions/textstats.py gopher_components/gopher_flags."""
    import re

    toks = re.split(r"\s+", text.strip().lower()) if True else []
    lines = text.split("\n")
    g = {
        "n_words": len(toks),
        "word_chars": sum(len(t) for t in toks),
        "sym_hits": text.count("#") + len(re.findall(r"\.\.\.", text)),
        "n_lines": len(lines),
        "bullet_lines": sum(1 for l in lines if re.match(r"^\s*[-*•]", l)),
        "ellipsis_lines": sum(
            1 for l in lines if re.search(r"(\.\.\.|…)\s*$", l)
        ),
        "alpha_words": sum(1 for t in toks if re.search("[a-z]", t)),
        "stop_hits": sum(
            1 for w in textstats.GOPHER_STOPWORDS if w in toks
        ),
    }
    g["ok_words"] = (
        textstats.GOPHER_MIN_WORDS <= g["n_words"] <= textstats.GOPHER_MAX_WORDS
    )
    g["ok_mean_len"] = 3 * g["n_words"] <= g["word_chars"] <= 10 * g["n_words"]
    g["ok_symbol"] = 10 * g["sym_hits"] <= g["n_words"]
    g["ok_bullet"] = 10 * g["bullet_lines"] <= 9 * g["n_lines"]
    g["ok_ellipsis"] = 10 * g["ellipsis_lines"] <= 3 * g["n_lines"]
    g["ok_alpha"] = 5 * g["alpha_words"] >= 4 * g["n_words"]
    g["ok_stop"] = g["stop_hits"] >= 2
    return g


_GOPHER_DOCS = [
    # one violator per rule + a clean doc that passes everything
    (0, "too few words and that is all of it"),                 # n_words < 50
    (1, " ".join(["supercalifragilistic"] * 60) + " the and"),  # mean len > 10
    (2, " ".join(["a", "b"] * 30) + " the and"),                # mean len < 3
    (3, " ".join(["word"] * 50) + " " + "# " * 10 + "the and"), # symbols
    (4, "\n".join(["- bullet point here the and of that"] * 10)),  # bullets
    (5, "\n".join(["trailing off the and of that..."] * 5)),    # ellipses
    (6, " ".join(["123"] * 30 + ["word"] * 30) + " the and"),   # alpha < 80%
    (7, " ".join(["lonely"] * 60)),                             # no stop words
    (8, "the quick brown fox jumps over that lazy dog and then "
        * 6 + "it rests"),                                      # clean: keep
]


def test_gopher_rules_match_python_reference(spark):
    df = spark.createDataFrame(_GOPHER_DOCS, "doc_id long, text string")
    g = textstats.gopher_components(F.col("text"))
    staged = df.select(
        "doc_id", *[c.alias(n) for n, c in g.items()]
    )
    fl = textstats.gopher_flags({k: F.col(k) for k in g})
    got = {
        r["doc_id"]: r.asDict()
        for r in staged.select(
            "doc_id", *g, *[c.alias(n) for n, c in fl.items()]
        ).collect()
    }
    for doc_id, text in _GOPHER_DOCS:
        want = _py_gopher(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id][k], v)


def test_gopher_one_violation_per_crafted_doc(spark):
    df = spark.createDataFrame(_GOPHER_DOCS, "doc_id long, text string")
    g = textstats.gopher_components(F.col("text"))
    staged = df.select("doc_id", *[c.alias(n) for n, c in g.items()])
    fl = textstats.gopher_flags({k: F.col(k) for k in g})
    rows = {
        r["doc_id"]: r.asDict()
        for r in staged.select(
            "doc_id", *[c.alias(n) for n, c in fl.items()]
        ).collect()
    }
    broken = {
        0: "ok_words", 1: "ok_mean_len", 2: "ok_mean_len", 3: "ok_symbol",
        4: "ok_bullet", 5: "ok_ellipsis", 6: "ok_alpha", 7: "ok_stop",
    }
    for doc_id, rule in broken.items():
        assert not rows[doc_id][rule], (doc_id, rule)
    assert all(rows[8].values()), rows[8]  # the clean doc passes every rule
