"""Edit-distance fuzzy join (operators/fuzzy.py) — completeness vs a
Python brute-force, including the variable-length cases (insertions and
deletions shift segment alignments; the probe's length enumeration and
shift window must not lose those pairs). Oracle parity for the registry
row is gated by the join_edit_distance CORRECTNESS row."""

from __future__ import annotations

import pytest

from demo_pgvector_spark.operators import fuzzy


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


CORPUS = [
    (0, "stone-plane-light"),
    (1, "store-plane-light"),   # 1 sub vs 0
    (2, "stone-plane-night"),   # 1 sub vs 0
    (3, "stone-plan-light"),    # 1 DELETION vs 0 (len 16)
    (4, "stones-plane-light"),  # 1 INSERTION vs 0 (len 18)
    (5, "stne-plan-light"),     # 2 deletions vs 0 (len 15)
    (6, "abcdefghijklmnopq"),   # unrelated, same length as 0
    (7, "share-grape-count"),   # unrelated same-shape
    (8, "shard-grape-count"),   # 1 sub vs 7
    (9, "x"),                   # tiny string (segment degeneracy)
    (10, "xy"),                 # within tau of 9
    (11, ""),                   # empty (all segments empty -> no index keys)
    (12, "stone-plane-light"),  # exact duplicate of 0 (dist 0)
]


@pytest.mark.parametrize("tau", [1, 2])
def test_matches_brute_force(spark, tau):
    df = spark.createDataFrame(CORPUS, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy.edit_distance_join(df, tau=tau).collect()
    }
    want = {}
    for i, (ia, na) in enumerate(CORPUS):
        for ib, nb in CORPUS[i + 1:]:
            d = _lev(na, nb)
            if d <= tau:
                want[(min(ia, ib), max(ia, ib))] = d
    got_keys = set(got)
    want_keys = set(want)
    assert want_keys - got_keys == set(), f"LOST pairs: {want_keys - got_keys}"
    assert got_keys - want_keys == set(), f"EXTRA pairs: {got_keys - want_keys}"
    assert got == want  # distances exact


def test_zero_tau_is_exact_match_join(spark):
    df = spark.createDataFrame(CORPUS, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy.edit_distance_join(df, tau=0).collect()
    }
    assert got == {(0, 12)}
