"""Build the SCALE.md replica dirs: the sf0.1 testdata replicated N×
with shifted ids, same parquet layout, SMALL row groups so the local
scanner has split points (without them, document-bound ops serialize on
one task and a 30× replica looks 13-19× instead of ~3× — SCALE.md §1).

Recipe (as used since round 3, now committed): only the FACT tables
replicate — lineitem/orders (joined keys shift together), events,
documents, embeddings. Dimension tables (region nation customer
supplier part) stay 1×, so replicated facts reference the same dims —
the realistic shape (fact growth, stable dims) and the one every
dim-broadcast plan is designed for. Id strides are max(id)+1 per source
table, so replicas never collide and modulus-based oracle literals
(doc_id % 41 etc.) see well-distributed ids on both engines.

Usage:
    python tools/make_replicas.py SRC DST N
    # e.g. python tools/make_replicas.py /root/testdata/sf0.1 /tmp/rep10 10
"""

from __future__ import annotations

import os
import sys

import duckdb

COPY_TABLES = ("region", "nation", "customer", "supplier", "part")
# Row-group sizing is a first-class scale knob (SCALE.md lesson 1):
# SMALL replicated tables need small groups or a single local file is
# ONE Spark task; but a blanket tiny group on the 18M-row facts taxes
# every scan with thousands of row-group initializations (the round-6
# replicas gave lineitem 8,761 groups of 2k rows, and tpch_q1's 30× scan
# went 5.9 s → 19.5 s purely from that layout). Facts get ~128k-row
# groups (plenty of split points at 18M rows), small tables keep 2k.
ROW_GROUP_SMALL = 2_000
ROW_GROUP_FACT = 131_072
FACT_TABLES = {"orders", "lineitem", "events"}


def replicate(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            f" (FORMAT parquet)"
        )

    s_ord = con.sql(
        f"SELECT MAX(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    s_ev = con.sql(
        f"SELECT MAX(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    s_usr = con.sql(
        f"SELECT MAX(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    s_doc = con.sql(
        f"SELECT MAX(doc_id) + 1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    s_vec = con.sql(
        f"SELECT MAX(vec_id) + 1 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]

    def fan(table: str, select_tpl: str) -> None:
        parts = " UNION ALL ".join(
            f"SELECT {select_tpl.format(r=r)} FROM '{src}/{table}.parquet'"
            for r in range(n)
        )
        rg = ROW_GROUP_FACT if table in FACT_TABLES else ROW_GROUP_SMALL
        con.sql(
            f"COPY ({parts}) TO '{dst}/{table}.parquet'"
            f" (FORMAT parquet, ROW_GROUP_SIZE {rg})"
        )

    fan("orders", f"o_orderkey + {{r}} * {s_ord} AS o_orderkey, o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    fan("lineitem", f"l_orderkey + {{r}} * {s_ord} AS l_orderkey, l_partkey,"
        " l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate")
    fan("events", f"event_id + {{r}} * {s_ev} AS event_id, ts,"
        f" user_id + {{r}} * {s_usr} AS user_id, event_type, value, props")
    fan("documents", f"doc_id + {{r}} * {s_doc} AS doc_id, * EXCLUDE (doc_id)")
    fan("embeddings", f"vec_id + {{r}} * {s_vec} AS vec_id, * EXCLUDE (vec_id)")
    print(f"{dst}: {n}x replicas built (strides ord={s_ord}, ev={s_ev},"
          f" usr={s_usr}, doc={s_doc}, vec={s_vec})")


if __name__ == "__main__":
    replicate(sys.argv[1], sys.argv[2], int(sys.argv[3]))
