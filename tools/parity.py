"""Local Spark-vs-DuckDB parity harness — mimics the driver's correctness gate.

Usage:
    python tools/parity.py [key ...] [--sf /root/testdata/sf0.01]

For each registry key with an oracle: run the Spark query and the DuckDB
SQL over the same parquet dir, then compare row count, sorted column
names, and the full multiset of values (exact match after normalization —
the same bar as the driver's value hash).
"""

from __future__ import annotations

import argparse
import datetime
import gc
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from demo_pgvector_spark import registry, tables  # noqa: E402
from demo_pgvector_spark.session import get_session  # noqa: E402


def _arrow_kind(t) -> str:
    """Collapse an Arrow type to the kind class the driver's value hash
    distinguishes. Decimal is deliberately NOT folded into int/float:
    DuckDB surfaces HUGEINT (uncast integer SUM) as decimal128, which
    hash-mismatches a Spark BIGINT even when every value is equal — the
    exact failure class that shipped red in round 5 (join_skew_salted)."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        # Spark surfaces map<...> through _spark_kind as 'struct'; fold the
        # Arrow side identically so a map-typed result column compares by
        # value instead of tripping a spurious TYPE MISMATCH (ADVICE r6).
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)


_SPARK_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "boolean": "bool",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp", "date": "date",
    "string": "str", "binary": "binary", "void": "null",
}


def _spark_kind(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array<"):
        return f"list<{_spark_kind(dt[6:-1])}>"
    if dt.startswith("struct<") or dt.startswith("map<"):
        return "struct"
    return _SPARK_KIND.get(dt, dt)


def _norm_val(v):
    if isinstance(v, Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, list):
        return tuple(_norm_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_val(x)) for k, x in v.items()))
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare_key(spark, con, key: str, sf_dir: str, verbose: bool = True):
    fn, sql = registry.REGISTRY[key]
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0

    if sql is None:
        print(f"  {key}: rows-only ({len(s_rows)} rows, {t_spark:.1f}s)")
        return len(s_rows) >= 0

    t0 = time.time()
    tbl = con.execute(sql).fetch_arrow_table()
    d_cols = tbl.column_names
    d_kinds = {n: _arrow_kind(f.type) for n, f in zip(d_cols, tbl.schema)}
    d_rows = [tuple(r.values()) for r in tbl.to_pylist()]
    t_duck = time.time() - t0

    ok = True
    if sorted(s_cols) != sorted(d_cols):
        print(f"  {key}: COLUMN MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
        ok = False
    else:
        s_kinds = {n: _spark_kind(dt) for n, dt in sdf.dtypes}
        kind_diffs = {
            n: (s_kinds[n], d_kinds[n]) for n in s_kinds if s_kinds[n] != d_kinds[n]
        }
        if kind_diffs:
            # Type-strict gate: value equality after coercion is NOT enough —
            # the driver hashes typed values, so a kind mismatch ships red.
            print(f"  {key}: TYPE MISMATCH (spark, duck) per column: {kind_diffs}")
            ok = False
    if len(s_rows) != len(d_rows):
        print(f"  {key}: ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}")
        ok = False
    if ok:
        _, sn = _norm_rows(s_cols, s_rows)
        _, dn = _norm_rows(d_cols, d_rows)
        if sn != dn:
            ok = False
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
            print(f"  {key}: VALUE MISMATCH ({len(diffs)}/{len(sn)} rows differ)")
            for a, b in diffs[:3]:
                print(f"    spark: {a}\n    duck : {b}")
    if ok and verbose:
        print(f"  {key}: OK ({len(s_rows)} rows, spark {t_spark:.1f}s, duck {t_duck:.2f}s)")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    keys = args.keys or list(registry.REGISTRY)
    spark = get_session("parity")
    con = duckdb.connect()
    # spill OUTSIDE the repo: DuckDB's default temp dir is ./.tmp, and a
    # pre-MATERIALIZED iterative oracle once wrote 40 GB there (and a
    # spill file leaked into a commit before .tmp/ was gitignored)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for name in tables.TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{args.sf}/{name}.parquet'"
        )

    print(f"parity @ {args.sf}: {len(keys)} keys")
    failures = []
    for k in keys:
        if not compare_key(spark, con, k, args.sf):
            failures.append(k)
        # Long single-session sweeps accumulate localCheckpoint blocks
        # (the dedup/CC keys checkpoint replica-scale gram arrays) that
        # only free once the Python DataFrame refs are collected and the
        # ContextCleaner runs; force the Python side so a 100-key replica
        # sweep can't OOM the shared local-mode heap.
        gc.collect()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
