"""functions/bpe.py + the real-merge chunk_bpe path: training
determinism, encoder correctness, artifact round-trip, golden coverage,
and UDF-vs-driver-encoder agreement."""

from __future__ import annotations

import os
import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.functions import bpe
from demo_pgvector_spark.operators import chunking

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MERGES_PATH = os.path.join(REPO, "golden", "bpe_merges.txt")
COSTS_PATH = os.path.join(REPO, "golden", "bpe_piece_costs.parquet")
PAT = re.compile(r"\w+|[^\w\s]", re.ASCII)


def test_train_learns_frequent_pairs_first():
    # "ab" dominates → first merge must be (a, b).
    merges = bpe.train_bpe({"abab": 10, "cd": 1}, 2)
    assert merges[0] == ("a", "b")


def test_train_deterministic_and_tie_break():
    freqs = {"xy": 3, "yx": 3, "zz": 1}
    m1 = bpe.train_bpe(freqs, 4)
    m2 = bpe.train_bpe(dict(freqs), 4)
    assert m1 == m2
    # (x,y) and (y,x) tie at 3 → lexicographically smaller pair first.
    assert m1[0] == ("x", "y")


def test_encode_applies_merges_in_rank_order():
    ranks = bpe.merge_ranks([("a", "b"), ("ab", "c")])
    assert bpe.encode("abc", ranks) == ["abc"]
    assert bpe.encode("acb", ranks) == ["a", "c", "b"]
    assert bpe.encode("", ranks) == []
    assert bpe.n_tokens("ababc", ranks) == 2  # ab + abc


def test_save_load_round_trip(tmp_path):
    merges = [("a", "b"), ("ab", "ab"), ("x", "yz")]
    p = str(tmp_path / "m.txt")
    bpe.save_merges(merges, p)
    assert bpe.load_merges(p) == merges


def test_committed_artifacts_cover_every_corpus_piece():
    """The golden (piece, cost) table must cover every distinct piece of
    every driver SF and agree with the committed merge table — otherwise
    the oracle's inner join silently drops rows."""
    ranks = bpe.merge_ranks(bpe.load_merges(MERGES_PATH))
    golden = dict(
        duckdb.sql(f"SELECT piece, cost FROM '{COSTS_PATH}'").fetchall()
    )
    corpus: Counter[str] = Counter()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for (t,) in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            corpus.update(PAT.findall(t or ""))
    missing = set(corpus) - set(golden)
    assert not missing, missing
    for piece in corpus:
        assert golden[piece] == bpe.n_tokens(piece, ranks), piece
    # the 32-merge budget must keep the cost model non-trivial
    assert {golden[p] for p in corpus} != {1}


@pytest.mark.usefixtures("spark")
def test_udf_costs_match_driver_encoder(spark):
    merges = bpe.load_merges(MERGES_PATH)
    ranks = bpe.merge_ranks(merges)
    texts = [
        "the customer orders a big table",
        "spark spark spark!",
        "",
        "group-by: hash join, merge join\n",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    tok = chunking.bpe_costs_udf(merges=merges)
    rows = df.select("id", tok(F.col("text")).alias("tc")).collect()
    for r in rows:
        t = texts[r["id"]]
        pieces = PAT.findall(t)
        assert list(r["tc"]["pieces"]) == pieces
        assert list(r["tc"]["costs"]) == [bpe.n_tokens(p, ranks) for p in pieces]


def test_encoder_at_pretrained_vocabulary_scale():
    """The merge-table slot must behave at REAL tokenizer scale (tens of
    thousands of ranks), not just the 32-merge corpus table: encoding
    stays rank-greedy-correct with a large table, lookup cost is
    rank-dict-bounded (no scan over the table per pair), and a piece
    touching no merge is a no-op. Builds a ~10k-rank synthetic merge
    table (valid by construction: each merge joins two previously
    producible symbols) rather than training one, since training an
    open vocabulary is the slow path the artifact build intentionally
    avoids."""
    import itertools
    import time

    from demo_pgvector_spark.functions import bpe

    # chain merges over a 26-letter alphabet: a+b, ab+c, abc+d ... plus
    # pair merges (x+y for many x,y) — every left symbol is producible.
    letters = "abcdefghijklmnopqrstuvwxyz"
    merges = []
    acc = "a"
    for c in itertools.islice(itertools.cycle(letters), 1, 400):
        merges.append((acc, c))
        acc += c
    # all 676 character pairs, then ~9k (pair, char) extensions — every
    # left symbol producible by an earlier rank
    pairs = list(itertools.product(letters, repeat=2))
    merges.extend(pairs)
    merges.extend(
        (x + y, z)
        for (x, y), z in itertools.islice(
            itertools.product(pairs, letters), 9000
        )
    )
    # dedupe while preserving first-rank-wins order (real tables are
    # rank-unique)
    seen, table = set(), []
    for m in merges:
        if m not in seen:
            seen.add(m)
            table.append(m)
    assert len(table) > 9500
    ranks = bpe.merge_ranks(table)

    # greedy correctness: 'ab' merges at its chain rank before the pair
    # table's later (x, y) ranks
    assert bpe.encode("ab", ranks) == ["ab"]
    assert bpe.encode("abc", ranks) == ["abc"]  # chain rank 2 wins
    # an all-consonant piece outside every merge stays character-split
    assert bpe.n_tokens("zzz", ranks) == 2  # ('z','z') IS in the pair table
    assert bpe.encode("q0q", ranks) == ["q", "0", "q"]  # digits: no merges

    # scale: ten thousand distinct pieces through the big table, fast —
    # per-piece cost depends on piece length and dict lookups only
    t0 = time.time()
    total = sum(
        bpe.n_tokens(f"{a}{b}{c}x{a}", ranks)
        for a, b, c in itertools.islice(
            itertools.product(letters, repeat=3), 10_000
        )
    )
    assert total > 0
    assert time.time() - t0 < 10.0


def test_fast_trainer_matches_didactic_trainer():
    """train_bpe_fast (incremental pair counts — the pretrained-scale
    path) must produce the IDENTICAL merge list as the didactic
    rescan-everything trainer, including lexicographic tie-breaks and
    the hapax stop rule."""
    import random

    for seed in range(8):
        rng = random.Random(seed)
        words: dict[str, int] = {}
        for _ in range(250):
            w = "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 9)))
            words[w] = words.get(w, 0) + rng.randint(1, 25)
        assert bpe.train_bpe_fast(dict(words), 60) == bpe.train_bpe(
            dict(words), 60
        ), seed


PRETRAINED_MERGES_PATH = os.path.join(
    REPO, "golden", "bpe_pretrained_merges.txt"
)
PRETRAINED_COSTS_PATH = os.path.join(
    REPO, "golden", "bpe_pretrained_piece_costs.parquet"
)


def test_pretrained_artifacts_are_consistent_and_at_scale():
    """The committed pretrained table must be ≥10k ranks, every rank's
    left/right symbol producible (chars or an earlier merge's output),
    and the golden cost parquet must equal n_tokens under the table for
    every corpus piece — with a non-collapsed cost spread (the
    applied-to-unseen-corpus property the 32-merge row can't show)."""
    merges = bpe.load_merges(PRETRAINED_MERGES_PATH)
    assert len(merges) >= 10_000
    producible = set()
    for a, b in merges:
        assert len(a) == 1 or a in producible, a
        assert len(b) == 1 or b in producible, b
        producible.add(a + b)
    ranks = bpe.merge_ranks(merges)
    rows = duckdb.sql(
        f"SELECT piece, cost FROM '{PRETRAINED_COSTS_PATH}'"
    ).fetchall()
    assert rows
    for piece, cost in rows:
        assert bpe.n_tokens(piece, ranks) == cost, piece
    spread = {c for _, c in rows}
    assert len(spread) >= 3  # costs 1..4 observed — not memorized flat
