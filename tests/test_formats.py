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


# ---------------------------------------------------------------------------
# Content-based MIME sniffing (operators/ingest.py sniff_mime)
# ---------------------------------------------------------------------------


def _sniff(spark, payloads):
    from demo_pgvector_spark.operators import ingest

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(payloads)],
        "id long, content binary",
    )
    rows = df.select(
        "id", ingest.sniff_mime(F.col("content")).alias("mime")
    ).collect()
    return [r["mime"] for r in sorted(rows, key=lambda r: r["id"])]


def test_sniff_magic_reads_bytes_not_names(spark):
    zip_hdr = b"PK\x03\x04" + b"\x00" * 26
    payloads = [
        b"%PDF-1.4 hello",
        b"\x89PNG\r\n\x1a\n....",
        b"\xff\xd8\xff\xe0jfif",
        b"\x1f\x8b\x08\x00gz",
        zip_hdr + b"mimetypeapplication/epub+zip rest",
        zip_hdr + b"content.xml rest",  # zip but NOT epub
        b"<!DOCTYPE html><p>x</p>",
        b"plain old prose",
        b"\tindented\ttext",  # tab first byte is still text
        b"\x00\x01\x02binary junk",  # unprintable -> octet-stream
    ]
    assert _sniff(spark, payloads) == [
        "application/pdf",
        "image/png",
        "image/jpeg",
        "application/gzip",
        "application/epub+zip",
        "application/zip",
        "text/html",
        "text/plain",
        "text/plain",
        "application/octet-stream",
    ]


def test_sniff_magic_tampered_header_changes_verdict(spark):
    """The verdict must come from the BYTES: flipping one magic byte
    demotes PNG to octet-stream, and truncating the EPUB 'mimetype'
    first-entry mark demotes EPUB to plain zip — no name or metadata
    can rescue either."""
    zip_hdr = b"PK\x03\x04" + b"\x00" * 26
    assert _sniff(
        spark,
        [
            b"\x88PNG\r\n\x1a\n....",  # first byte flipped
            zip_hdr + b"mimetypeapplication/epub+zipX"[:-2],  # mark cut
        ],
    ) == ["application/octet-stream", "application/zip"]


def test_route_by_content_overrides_extension(spark):
    """A PDF named .txt must route by CONTENT (rejected — no tool),
    flagged as a mismatch; a real text file named .txt stays ready."""
    from demo_pgvector_spark.operators import ingest

    df = spark.createDataFrame(
        [
            (0, bytearray(b"%PDF-1.4 x"), "/import/doc_0.txt"),
            (1, bytearray(b"just words"), "/import/doc_1.txt"),
        ],
        "doc_id long, content binary, filepath string",
    )
    rows = {
        r["doc_id"]: r
        for r in ingest.route_by_content(df).collect()
    }
    assert rows[0]["content_mime"] == "application/pdf"
    assert rows[0]["mismatch"] and rows[0]["route"] == "rejected"
    assert rows[1]["content_mime"] == "text/plain"
    assert not rows[1]["mismatch"] and rows[1]["route"] == "ready"
