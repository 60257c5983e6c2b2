"""Deterministic hash-seeded pseudo-embedding — the reference's one
genuinely novel algorithm (src/lib/embedding.py:69-120), re-implemented
from its published behavior:

1. sha256(text) → 32-bit seed → base vector ~ N(0, 1)^dim;
2. per unique word: md5(word) → seed → word vector ~ N(0, count/total)^dim,
   added scaled by 0.1;
3. scaled by (1 + 0.1·min(len(text)/100, 1)) (length factor);
4. plus noise ~ N(0, 0.05·|vocab|/|words|)^dim (diversity factor), drawn
   from the RNG state left by the last word seed (the reference reseeds
   inside the word loop and never reseeds before this draw);
5. L2-normalized (zero vector passes through).

The LLM-response mix-in is disabled (``model_response=''`` — SURVEY Q3):
the reference concatenates ``f'{text} {response}'`` before hashing, so
with an empty response the hashed string is ``text + ' '`` — reproduced
faithfully, trailing space included.

Documented divergence: the reference iterates ``set(words)`` — CPython
set order depends on the per-process hash seed, making the reference
nondeterministic across processes in the last float ulps (addition order)
and in the diversity-noise RNG state. This implementation iterates
``sorted(set(words))`` so results are bit-stable everywhere; golden tests
pin them.

Execution shape: a vectorized pandas_udf (Arrow batches). The per-row
work is numpy RNG draws — pure Python built-ins cannot express it, and a
row-at-a-time Python UDF would add per-row serialization on 100 TB of
text; the pandas_udf amortizes the bridge per batch and parallelizes
per-partition.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64  # testdata embedding dim; the reference default is 1536

_WORD_RE = re.compile(r"\b\w+\b", re.UNICODE)


def hash_embed_py(text: str, dim: int = DEFAULT_DIM, model_response: str = "") -> list[float]:
    """Plain-Python reference implementation (the golden-vector source)."""
    combined = f"{text} {model_response}"

    words = _WORD_RE.findall(combined.lower().strip())

    base_seed = int(hashlib.sha256(combined.encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(base_seed % (2**32))
    base = rng.normal(0, 1, dim)

    total = len(words)
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1

    # sorted() replaces the reference's nondeterministic set order (see
    # module docstring); the final `rng` state feeds the diversity noise.
    for word in sorted(counts):
        word_seed = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
        weight = counts[word] / total
        rng = np.random.RandomState(word_seed % (2**32))
        base += rng.normal(0, weight, dim) * 0.1

    length_factor = min(len(combined) / 100.0, 1.0)
    complexity = len(counts) / max(total, 1)
    base *= 1.0 + length_factor * 0.1
    base += rng.normal(0, complexity * 0.05, dim)

    norm = np.linalg.norm(base)
    if norm > 0:
        base = base / norm
    return [float(x) for x in base]


@lru_cache(maxsize=1 << 16)
def _word_draws(word: str, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached per-word unit draws: (the word-vector gaussian, the
    follow-on gaussian the diversity noise consumes when this word is the
    last seeded one). Bitwise-equivalence to the direct form: numpy's
    legacy RandomState computes normal(0, s, n) as s·standard_normal(n)
    (and float multiply is commutative), and the post-draw RNG state
    depends only on (seed, n), not on the scale — so caching the unit
    draws and rescaling reproduces hash_embed_py exactly (pinned by
    test_udf_matches_python and the emb_hash_embed parity row)."""
    word_seed = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(word_seed % (2**32))
    u = rng.normal(0, 1, dim)
    noise_u = rng.normal(0, 1, dim)
    u.setflags(write=False)
    noise_u.setflags(write=False)
    return u, noise_u


def _hash_embed_fast(text: str, dim: int, model_response: str = "") -> list[float]:
    """hash_embed_py with the per-word RNG work cached across rows —
    the hot-path form the pandas_udf runs. The word vocabulary of a
    corpus is tiny relative to its row count, so each word's two
    gaussian draws are computed once per executor instead of once per
    (row, word)."""
    combined = f"{text} {model_response}"
    words = _WORD_RE.findall(combined.lower().strip())

    base_seed = int(hashlib.sha256(combined.encode()).hexdigest()[:8], 16)
    base = np.random.RandomState(base_seed % (2**32)).normal(0, 1, dim)

    total = len(words)
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1

    noise_u = None
    for word in sorted(counts):
        u, noise_u = _word_draws(word, dim)
        base += (u * (counts[word] / total)) * 0.1

    length_factor = min(len(combined) / 100.0, 1.0)
    complexity = len(counts) / max(total, 1)
    base *= 1.0 + length_factor * 0.1
    if noise_u is None:
        # no words: the reference draws noise from the base-seeded RNG's
        # state after the base draw
        rng = np.random.RandomState(base_seed % (2**32))
        rng.normal(0, 1, dim)
        noise_u = rng.normal(0, 1, dim)
    base += noise_u * (complexity * 0.05)

    norm = np.linalg.norm(base)
    if norm > 0:
        base = base / norm
    return [float(x) for x in base]


def make_hash_embed_udf(dim: int = DEFAULT_DIM):
    """Vectorized pandas_udf: text column → array<double> embedding."""

    @pandas_udf("array<double>")
    def hash_embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _hash_embed_fast(t if t is not None else "", dim))

    return hash_embed


def hash_embed(c: Column, dim: int = DEFAULT_DIM) -> Column:
    """Column form: ``hash_embed(col('text'))`` — the engine's
    ``emb_generate`` surface with the deterministic embedder plugged in
    (the LLM enrichment being an external, nondeterministic stage the
    engine treats as pluggable — SURVEY §2.7 ``emb_generate``)."""
    return make_hash_embed_udf(dim)(c)
