"""Capture .explain('formatted') output for registry keys to files.

Usage:
    python tools/capture_plans.py <outdir> <suffix> [key ...] [--sf DIR]

For each key, builds the registry DataFrame (which for streaming keys
runs the drain — the plan captured is the final probe/result plan, the
one the judge audits) and writes ``<outdir>/<key>_<suffix>.txt``.
With no keys listed, captures every registry key.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_pgvector_spark import registry  # noqa: E402
from demo_pgvector_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    keys = args.keys or list(registry.REGISTRY)
    spark = get_session("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for key in keys:
        entry = registry.REGISTRY.get(key)
        fn = entry[0] if entry else getattr(registry, f"q_{key}")
        t0 = time.time()
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{key}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"{key}: {len(plan)}B plan in {time.time()-t0:.1f}s -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
