"""Generate golden hash-embedding vectors for the CORRECTNESS oracle.

The hash-embed algorithm is pure numpy — not expressible in DuckDB SQL —
so the oracle for ``emb_hash_embed`` is a *precomputed golden parquet*
(VERDICT r1 "Next round" #2): this script runs the plain-Python
implementation (``hash_embed_py``, the same function the pandas_udf
wraps) over the sf0.01 and sf0.001 documents tables once, and the oracle
SQL simply reads the stored result. The parity gate then proves the
distributed Arrow-batched UDF path reproduces the single-process Python
path bit-for-bit.

Usage: python tools/make_golden.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from demo_pgvector_spark.functions.embedding import DEFAULT_DIM, hash_embed_py  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")

# One golden file keyed by sha256(text) covering every SF's documents, so
# the oracle SQL (a join on sha256(d.text)) works unchanged at sf0.001
# (local pytest), sf0.01 (driver gate), and sf0.1 (bench).
SFS = ("0.001", "0.01", "0.1")


def make() -> str:
    dst = os.path.join(GOLDEN_DIR, "emb_hash_embed.parquet")
    con = duckdb.connect()
    srcs = ", ".join(f"'/root/testdata/sf{sf}/documents.parquet'" for sf in SFS)
    rows = con.execute(
        f"SELECT DISTINCT text FROM read_parquet([{srcs}]) ORDER BY text"
    ).fetchall()
    data = [
        (hashlib.sha256(text.encode()).hexdigest(), hash_embed_py(text, DEFAULT_DIM))
        for (text,) in rows
    ]
    con.execute("CREATE TABLE g (text_sha VARCHAR, embedding DOUBLE[])")
    con.executemany("INSERT INTO g VALUES (?, ?)", data)
    con.execute(f"COPY g TO '{dst}' (FORMAT PARQUET)")
    return f"{dst} ({len(data)} distinct texts)"


def make_planes() -> str:
    """LSH hyperplanes shared between the Spark ANN operator and the
    DuckDB oracle, which independently recomputes signatures/buckets/
    candidates from them (operators/ann.py module docstring)."""
    from demo_pgvector_spark.operators.ann import hyperplanes

    dst = os.path.join(GOLDEN_DIR, "ann_planes.parquet")
    planes = hyperplanes(dim=64)
    con = duckdb.connect()
    con.execute("CREATE TABLE p (t INTEGER, j INTEGER, plane DOUBLE[])")
    con.executemany(
        "INSERT INTO p VALUES (?, ?, ?)",
        [
            (t, j, [float(x) for x in planes[t, j]])
            for t in range(planes.shape[0])
            for j in range(planes.shape[1])
        ],
    )
    con.execute(f"COPY p TO '{dst}' (FORMAT PARQUET)")
    return dst


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    print("wrote", make())
    print("wrote", make_planes())
