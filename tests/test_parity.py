"""Oracle parity for every registry key — the same bar the driver applies."""

from __future__ import annotations

import pytest

from demo_pgvector_spark import registry
from tools.parity import compare_key

KEYS = sorted(registry.REGISTRY)


@pytest.mark.parametrize("key", KEYS)
def test_parity(spark, duck, sf_dir, key):
    assert compare_key(spark, duck, key, sf_dir, verbose=False)
