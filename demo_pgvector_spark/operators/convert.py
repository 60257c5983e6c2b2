"""Document conversion — the pandoc EPUB→Markdown stage of the
reference's ingest (``EPUBSourceConversionTool``,
src/lib/sources.py:64-172), re-expressed for an engine.

The reference shells out to pandoc per file and writes a temp ``.md``
path (src/lib/sources.py:77-150); the engine keeps content in columns:
binary container in → markdown string column out, no filesystem
round-trip. Real pandoc isn't in this container, so — exactly like the
multimodal codecs — the *external* tool is an explicit stub
(``convert_external``) while the conversion plumbing runs against a
deterministic container format (``SPKB``) with a real parser:

    b'EPUB|<n_chapters>|' + chapter texts joined by NUL bytes

``fake_epubs`` builds the container JVM-side by splitting each
document's token stream into chapters, so the DuckDB oracle can predict
the converter's exact markdown output from the source text alone — the
CORRECTNESS row proves the mapInPandas parse+render path end to end.

Scale: conversion is per-row map work over Arrow batches; no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_CHAPTERS = 2


def fake_epubs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, content binary): SPKB containers with the document's
    tokens split into two equal-as-possible chapters."""
    half = "cast(ceil(size(_toks) / 2.0) as int)"
    return (
        docs.withColumn("_toks", F.split(F.col(text_col), " "))
        .withColumn("_ch1", F.expr(f"concat_ws(' ', slice(_toks, 1, {half}))"))
        .withColumn(
            "_ch2", F.expr(f"concat_ws(' ', slice(_toks, {half} + 1, size(_toks)))")
        )
        .select(
            "doc_id",
            F.expr(
                "concat(encode('EPUB|2|', 'UTF-8'), encode(_ch1, 'UTF-8'),"
                " unhex('00'), encode(_ch2, 'UTF-8'))"
            ).alias("content"),
        )
    )


def convert_epub(media: DataFrame) -> DataFrame:
    """SPKB container → markdown: parse header, split chapters, render
    ``# Chapter N`` sections (the pandoc-output shape)."""

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(blob)
                tag, n, payload = raw.split(b"|", 2)
                assert tag == b"EPUB", tag
                chapters = payload.split(b"\x00")
                assert len(chapters) == int(n), (len(chapters), n)
                md = "\n\n".join(
                    f"# Chapter {i + 1}\n\n{c.decode('utf-8')}"
                    for i, c in enumerate(chapters)
                )
                out.append((int(doc_id), md))
            yield pd.DataFrame(out, columns=["doc_id", "markdown"])

    return media.mapInPandas(conv, "doc_id long, markdown string")


def convert_external(media: DataFrame, tool: str) -> DataFrame:
    """Stub for real converters (pandoc, docling): not present in this
    environment — re-checked round 3: no ``pandoc`` binary, no
    ``pypandoc`` module, and package installation is out of scope, so
    the real-tool path is a documented impossibility here. Swapping it
    in changes only the per-row byte→text step (a ``subprocess.run``
    per Arrow batch row inside the same ``mapInPandas``); the Spark
    plumbing — schema, batching, partitioning — is identical to
    ``convert_epub``, which parses real bytes end-to-end."""
    raise NotImplementedError(
        f"external converter {tool!r} is not available here; use the SPKB "
        "converter or install pandoc and implement the subprocess call"
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("lang",), mode: str = "overwrite"
) -> None:
    """The engine's sink (``sink_pg`` analog — reference
    src/lib/database.py:217-280 writes per-row INSERTs; the engine writes
    one columnar job). Hive-style partition directories mean later scans
    with a predicate on the partition column read only matching
    directories — partition pruning, the 100 TB analog of an index."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
