"""Golden + property tests for the deterministic hash embedder
(reference src/lib/embedding.py:69-120; see functions/embedding.py for
the documented set-order divergence)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.functions.embedding import (
    hash_embed,
    hash_embed_py,
)

# Golden vectors: first 4 components at dim=8 for fixed inputs, pinned at
# generation time. These fail if ANY stage of the algorithm (seed
# derivation, word weighting, length/diversity factors, normalization)
# drifts.
GOLDEN = {
    "the quick brown fox": [-0.03686605, -0.58811569, -0.26743029, -0.49828835],
    "hello": [-0.17343738, -0.06099696, -0.19578553, -0.35907094],
    "": [0.0850043, 0.38259788, -0.19694618, -0.06708296],
}


def test_golden_vectors():
    for text, want in GOLDEN.items():
        got = hash_embed_py(text, dim=8)[:4]
        assert got == pytest.approx(want, abs=1e-7), text


def test_unit_norm():
    for text in ("a", "some longer text with repeated words words words", "", "句子"):
        v = np.array(hash_embed_py(text, dim=32))
        assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-12)


def test_deterministic_across_calls():
    a = hash_embed_py("determinism check", dim=16)
    b = hash_embed_py("determinism check", dim=16)
    assert a == b


def test_word_weight_sensitivity():
    # repeated words change weights, so the vector must move
    assert hash_embed_py("cat dog", dim=16) != hash_embed_py("cat cat dog", dim=16)


def test_udf_matches_python(spark):
    texts = ["alpha beta", "gamma", "", "the the the", "混合 text 123"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    out = {
        r["i"]: r["e"]
        for r in df.select("i", hash_embed(F.col("t"), dim=16).alias("e")).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == pytest.approx(hash_embed_py(t, dim=16), abs=0), t
