"""Train the PRETRAINED-scale BPE merge table (≥10k ranks) and the
golden piece-cost parquet its DuckDB oracle joins.

The committed corpus table (golden/bpe_merges.txt) is deliberately tiny
— 32 merges, because the testdata documents have a CLOSED ~31-word
vocabulary and an open budget would memorize it (see tools/train_bpe.py).
The reference, however, chunks with a PRETRAINED HuggingFace tokenizer
(src/lib/documents.py:67-90): a ~10k-50k-rank vocabulary learned on a
LARGE open corpus, then APPLIED to whatever documents arrive. This tool
reproduces that contract end to end with public algorithms only:

1. Generate a deterministic synthetic open-vocabulary training corpus
   (seeded PRNG; Zipfian word frequencies over a prefix+stem+suffix
   morphology, so merges learn genuine subword structure exactly as a
   natural-language vocab does — frequent affixes merge early, rare
   stems stay split).
2. Train ``NUM_MERGES`` (10 000) merges with the incremental trainer
   (functions/bpe.py train_bpe_fast — the Sennrich 2016 pair-count
   formulation; pytest pins its equivalence to the didactic loop).
3. Write ``golden/bpe_pretrained_merges.txt`` plus
   ``golden/bpe_pretrained_piece_costs.parquet`` — the token cost of
   every distinct piece of the sf0.001/0.01/0.1 documents corpora under
   the pretrained table, which is all the DuckDB oracle needs (DuckDB
   cannot run the merge loop; the emb_hash_embed golden pattern).

Run:  python tools/train_bpe_pretrained.py
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_pgvector_spark.functions import bpe  # noqa: E402

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
NUM_MERGES = 10_000
SEED = 20260814
PAT = re.compile(r"\w+|[^\w\s]", re.ASCII)

# Morphology inventory sizes: ~40k distinct surface forms built from
# shared subparts gives the pair-count tail needed for 10k merges with
# count ≥ 2 (the trainer stops at hapax pairs by design).
N_STEMS = 2_000
N_PREFIXES = 60
N_SUFFIXES = 80
N_WORDS = 40_000


def _syllable(rng: random.Random) -> str:
    onsets = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
              "r", "s", "t", "v", "w", "z", "st", "tr", "ch", "sh", "th",
              "pl", "gr", "br", ""]
    nuclei = ["a", "e", "i", "o", "u", "ai", "ea", "ou", "io"]
    codas = ["", "n", "r", "s", "t", "l", "m", "nd", "st", "ck", "ng"]
    return rng.choice(onsets) + rng.choice(nuclei) + rng.choice(codas)


def build_corpus() -> dict[str, int]:
    """Deterministic (word → frequency) table: Zipfian ranks over a
    morphologically compositional vocabulary."""
    rng = random.Random(SEED)
    stems = [_syllable(rng) + _syllable(rng) for _ in range(N_STEMS)]
    prefixes = [_syllable(rng) for _ in range(N_PREFIXES)]
    suffixes = [_syllable(rng) for _ in range(N_SUFFIXES)]
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < N_WORDS:
        w = rng.choice(stems)
        if rng.random() < 0.5:
            w = rng.choice(prefixes) + w
        if rng.random() < 0.6:
            w = w + rng.choice(suffixes)
        if w not in seen:
            seen.add(w)
            words.append(w)
    # Zipf: frequency of rank r ∝ 1/r, scaled so the head is large and
    # the tail still recurs (min frequency 2 keeps tail pairs trainable).
    freqs: dict[str, int] = {}
    for r, w in enumerate(words, start=1):
        freqs[w] = max(2, int(200_000 / r))
    return freqs


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    golden = os.path.join(repo, "golden")
    os.makedirs(golden, exist_ok=True)

    corpus = build_corpus()
    merges = bpe.train_bpe_fast(corpus, NUM_MERGES)
    merges_path = os.path.join(golden, "bpe_pretrained_merges.txt")
    bpe.save_merges(merges, merges_path)

    # Golden (piece, cost) for every distinct piece the driver corpora
    # contain — the oracle's join table.
    pieces: Counter[str] = Counter()
    for sf in SF_DIRS:
        rows = duckdb.sql(
            f"SELECT text FROM '{sf}/documents.parquet'"
        ).fetchall()
        for (text,) in rows:
            pieces.update(PAT.findall(text or ""))
    ranks = bpe.merge_ranks(merges)
    costs = [(p, bpe.n_tokens(p, ranks)) for p in sorted(pieces)]
    duckdb.sql("CREATE OR REPLACE TABLE t (piece VARCHAR, cost BIGINT)")
    duckdb.executemany("INSERT INTO t VALUES (?, ?)", costs)
    out = os.path.join(golden, "bpe_pretrained_piece_costs.parquet")
    duckdb.sql(f"COPY t TO '{out}' (FORMAT parquet)")

    spread = Counter(c for _, c in costs)
    print(
        f"{len(merges)} merges -> {merges_path}\n"
        f"{len(costs)} piece costs -> {out}\n"
        f"corpus: {sum(corpus.values())} tokens, {len(corpus)} distinct\n"
        f"testdata piece-cost spread: {dict(sorted(spread.items()))}"
    )


if __name__ == "__main__":
    main()
