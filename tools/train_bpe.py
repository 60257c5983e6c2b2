"""Train the committed BPE merge table from the testdata corpus and
materialize the golden piece-cost parquet the DuckDB oracle joins.

Reproducible build of two repo artifacts:

- ``golden/bpe_merges.txt``  — ``NUM_MERGES`` (32) merges learned
  (deterministically — ties break lexicographically) from the
  pre-tokenized pieces of every ``documents`` table the driver tests
  against (sf0.001/0.01/0.1); see the NUM_MERGES comment for why 32.
- ``golden/bpe_piece_costs.parquet`` — (piece, cost) for every DISTINCT
  piece across those corpora, cost = token count under the merge table.
  DuckDB cannot run the merge loop, so the oracle recomputes the piece
  stream (regexp pre-tokenizer) and JOINS this table for costs — the
  same golden-artifact pattern as emb_hash_embed.

Run:  python tools/train_bpe.py
"""

from __future__ import annotations

import os
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
# The synthetic documents corpus has a CLOSED ~31-word vocabulary, so an
# open-ended merge budget memorizes every word and collapses all costs to
# 1 (measured: 1024 or even 89 merges suffice). A real tokenizer on an
# open corpus keeps rare words multi-token; 32 merges preserves exactly
# that property here — frequent words reach 1 token, rarer ones stay
# split (measured cost spread 1..5 over the 31 pieces) — so the merge
# loop, the golden join, and the budget packing all stay non-trivial.
NUM_MERGES = 32
# Same ASCII pre-tokenizer as chunking.bpe_costs_udf / the Catalyst path.
PAT = re.compile(r"\w+|[^\w\s]", re.ASCII)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    golden = os.path.join(repo, "golden")
    os.makedirs(golden, exist_ok=True)

    freqs: Counter[str] = Counter()
    for sf in SF_DIRS:
        rows = duckdb.sql(
            f"SELECT text FROM '{sf}/documents.parquet'"
        ).fetchall()
        for (text,) in rows:
            freqs.update(PAT.findall(text or ""))

    merges = bpe.train_bpe(dict(freqs), NUM_MERGES)
    merges_path = os.path.join(golden, "bpe_merges.txt")
    bpe.save_merges(merges, merges_path)

    ranks = bpe.merge_ranks(merges)
    costs = [(p, bpe.n_tokens(p, ranks)) for p in sorted(freqs)]
    duckdb.sql(
        "CREATE OR REPLACE TABLE t (piece VARCHAR, cost BIGINT)"
    )
    duckdb.executemany("INSERT INTO t VALUES (?, ?)", costs)
    out = os.path.join(golden, "bpe_piece_costs.parquet")
    duckdb.sql(f"COPY t TO '{out}' (FORMAT parquet)")

    print(
        f"{len(merges)} merges -> {merges_path}\n"
        f"{len(costs)} piece costs -> {out}\n"
        f"corpus: {sum(freqs.values())} pieces, {len(freqs)} distinct"
    )


if __name__ == "__main__":
    main()
