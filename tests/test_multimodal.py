"""Multimodal plumbing tests (operators/multimodal.py): decode
round-trips, resize vs numpy, multi-Arrow-batch iteration, 1→N frame
explosion, and the explicit external-codec stub."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    ).cache()


def _expected_pixels(doc_id: int) -> np.ndarray:
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    blocks = -(-(w * h) // 16)
    raw = b"".join(
        hashlib.md5(f"img:{doc_id}:{b}".encode()).digest() for b in range(blocks)
    )
    return np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)


def test_decode_matches_spec(spark, docs_df):
    media = mm.fake_images(docs_df).select("doc_id", "content")
    rows = {r["doc_id"]: r for r in mm.decode_images(media).collect()}
    for doc_id in (0, 7, 23):
        px = _expected_pixels(doc_id)
        r = rows[doc_id]
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["n_pixels"] == px.size
        assert r["mean_intensity"] == pytest.approx(float(px.mean()))
        assert r["max_intensity"] == int(px.max())


def test_resize_matches_numpy_stride(spark, docs_df):
    media = mm.fake_images(docs_df).select("doc_id", "content")
    rows = {r["doc_id"]: r for r in mm.resize_images(media, factor=2).collect()}
    for doc_id in (0, 13, 31):
        small = _expected_pixels(doc_id)[::2, ::2]
        r = rows[doc_id]
        assert (r["r_width"], r["r_height"]) == (small.shape[1], small.shape[0])
        assert r["r_mean"] == pytest.approx(float(small.mean()))


def test_multiple_arrow_batches(spark, docs_df):
    """The decoder must be correct when a partition spans several Arrow
    batches — the 100 TB batch shape, forced here with a tiny batch cap."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        media = mm.fake_images(docs_df).repartition(2).select("doc_id", "content")
        out = mm.decode_images(media)
        assert out.count() == 40
        assert out.select(F.sum("n_pixels")).first()[0] == sum(
            (4 + i % 8) * (3 + i % 5) for i in range(40)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_frame_sampling_explodes_rows(spark, docs_df):
    media = mm.fake_videos(docs_df).select("doc_id", "content")
    out = mm.sample_frames(media).collect()
    assert len(out) == sum(2 + i % 4 for i in range(40))
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, frames in by_doc.items():
        assert sorted(f["frame_no"] for f in frames) == list(range(2 + doc_id % 4))
        for f in frames:
            want = hashlib.md5(f"vid:{doc_id}:{f['frame_no']}".encode()).hexdigest()
            assert f["frame_hex"] == want


def test_frame_sampling_stride(spark, docs_df):
    media = mm.fake_videos(docs_df.filter(F.col("doc_id") == 3)).select(
        "doc_id", "content"
    )  # doc 3 → 5 frames
    out = mm.sample_frames(media, every=2).collect()
    assert sorted(r["frame_no"] for r in out) == [0, 2, 4]


def test_external_codec_is_explicit_stub(spark, docs_df):
    media = mm.fake_images(docs_df)
    with pytest.raises(NotImplementedError, match="jpeg"):
        mm.decode_external(media, "jpeg")
