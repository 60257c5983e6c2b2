"""Shared synthetic-fixture constants for the query registry.

The testdata tables (TESTDATA.md) carry no file paths, sidecar metadata,
or chunking parameters, so the registry derives them deterministically;
both the Spark queries (registry.py) and the DuckDB oracle SQL
(oracles.py) must synthesize EXACTLY the same values, which is why these
constants live in a module both can import without circularity.
"""

from __future__ import annotations


QUERY_VEC_ID = 0

_EXTS = ("txt", "epub", "md", "bin")

_SIDECARS = [
    (f"src{n}", f"author_{n}", "fiction" if n % 4 == 0 else "nonfiction")
    for n in range(0, 20, 2)
]

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

_CHUNK_TOKENS = 32  # testdata docs are 10-100 words; 32 exercises 1-4 chunks

_BPE_CHUNK_TOKENS = 24  # ~18 words/chunk on the 10-100-word testdata docs

_SOURCE_COLS = (
    "author title source_type url genre subgenre year model_id".split()
)

RAG_PROMPT = "what do the Archives say about windows and sorting?"
