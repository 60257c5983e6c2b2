"""Run-to-run determinism probe — the tool behind the round-10
agg_multidim catch, committed so the methodology is reusable.

A key can be green against its oracle on every recorded run and still
be NONDETERMINISTIC: if a displayed value sits within the engine's
run-to-run variance of a rounding boundary (the ~1.1e12 double sum
whose exact value ended .800), both engines flip independently and
parity only fails when they happen to disagree. The sweeps sample that
coin once per round; this probe flips it N times.

For each key: run the SPARK query N times in one session and compare
the canonicalized result multisets pairwise; report any key whose own
output moved between runs (the oracle never enters — self-disagreement
is already a defect). Canonicalization matches tools/parity.py's bar:
sorted column names, full value multiset.

Usage:
    python tools/flake_probe.py KEY [KEY ...] [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_pgvector_spark import registry  # noqa: E402
from demo_pgvector_spark.session import get_session  # noqa: E402


def _canon(df) -> tuple:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )
    return (tuple(cols), tuple(rows))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    spark = get_session("flake_probe")
    spark.sparkContext.setLogLevel("ERROR")
    flaky: list[str] = []
    for key in args.keys:
        fn = registry.REGISTRY[key][0]
        baseline = None
        moved = False
        for i in range(args.reps):
            got = _canon(fn(spark, args.sf))
            if baseline is None:
                baseline = got
            elif got != baseline:
                moved = True
                a, b = set(baseline[1]), set(got[1])
                print(f"  {key}: RUN {i} DIVERGED "
                      f"({len(a - b)} rows changed of {len(baseline[1])})")
                for row in sorted(a ^ b)[:6]:
                    print(f"    {row}")
                break
            gc.collect()
        status = "FLAKY" if moved else f"stable x{args.reps}"
        print(f"{key}: {status}")
        if moved:
            flaky.append(key)
    if flaky:
        print(f"FLAKY: {flaky}")
        sys.exit(1)
    print("ALL STABLE")


if __name__ == "__main__":
    main()
