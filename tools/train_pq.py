"""Materialize golden/pq_codebooks.parquet — trained PQ codebooks for
the vec_pq_topk / vec_ivfpq_pruned registry rows.

Training data is the sf0.01 embeddings table (a deterministic md5-order
sample inside ``train_pq_codebooks``), m=8 subspaces × k=16 codewords
over dim=64, 8 Lloyd iterations, centroids rounded to 6dp. The golden
file is the single source of truth for BOTH engines: the Spark queries
load it driver-side (registry._pq_codebooks) and the DuckDB oracles
read it with read_parquet — identical doubles, so the ADC replay is
bit-exact.

Re-run only when the training recipe changes:

    python tools/train_pq.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_pgvector_spark import tables  # noqa: E402
from demo_pgvector_spark.operators.ann import train_pq_codebooks  # noqa: E402
from demo_pgvector_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "golden",
    "pq_codebooks.parquet",
)


def main() -> None:
    spark = get_session("train_pq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = tables.load(spark, SF_DIR, "embeddings")
    books = train_pq_codebooks(emb)
    rows_s, rows_cid, rows_cv = [], [], []
    for s, cb in enumerate(books):
        for cid, cw in enumerate(cb):
            rows_s.append(s)
            rows_cid.append(cid)
            rows_cv.append(cw)
    t = pa.table(
        {
            "s": pa.array(rows_s, pa.int32()),
            "cid": pa.array(rows_cid, pa.int32()),
            "cv": pa.array(rows_cv, pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, OUT)
    print(f"wrote {OUT}: m={len(books)} k={len(books[0])} subdim={len(books[0][0])}")


if __name__ == "__main__":
    main()
