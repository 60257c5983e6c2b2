"""Multi-format source/sink round-trips (tables.write_table/read_table):
the engine must read data back bit-faithfully from every supported
format, with explicit schemas on the schemaless ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark import tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF, "documents").cache()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, docs, fmt, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fmt") / f"docs_{fmt}")
    tables.write_table(docs, path, fmt)
    back = tables.read_table(spark, path, fmt, schema=docs.schema)
    assert back.schema == docs.schema
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b, fmt


def test_columnar_formats_push_down(spark, docs, tmp_path_factory):
    """Predicate pushdown must reach the scan for parquet and ORC; the
    interchange formats can't offer it — which is WHY they stay at the
    ingest edge."""
    for fmt in ("parquet", "orc"):
        path = str(tmp_path_factory.mktemp("pd") / fmt)
        tables.write_table(docs, path, fmt)
        q = tables.read_table(spark, path, fmt, schema=docs.schema).filter(
            F.col("doc_id") == 7
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "IsNotNull(doc_id)" in plan, fmt


def test_unknown_format_rejected(spark, docs):
    with pytest.raises(ValueError, match="unsupported format"):
        tables.write_table(docs, "/tmp/x", "avro")
