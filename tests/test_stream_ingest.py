"""Streaming write path: foreachBatch + idempotent upsert = exactly-once
table state (streaming/ingest.py).

Three properties, each a real readStream execution over staged files:

1. stream-batch symmetry — streaming the rows file-by-file produces the
   same KEY SET as one batch upsert, with dense unique ids;
2. retry idempotence — re-applying an already-processed micro-batch (the
   at-least-once failure mode foreachBatch exposes) leaves the committed
   key/id state unchanged;
3. version isolation — every commit is a new directory behind the
   ``_CURRENT`` pointer; a reader holding the old version still works.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark.operators import write as write_ops
from demo_pgvector_spark.streaming import ingest

SCHEMA = "id long, name string"


@pytest.fixture()
def staged(tmp_path):
    """Three arrival files with overlapping model names (m0..m5)."""
    land = tmp_path / "landing"
    land.mkdir()
    batches = [["m0", "m1", "m2"], ["m1", "m3"], ["m0", "m4", "m5", "m3"]]
    return land, batches


def _stage(spark, land, batches):
    for i, names in enumerate(batches):
        spark.createDataFrame(
            [(n,) for n in names], "name string"
        ).coalesce(1).write.parquet(str(land / f"arrival_{i}"))


def test_stream_upsert_matches_batch_upsert(spark, tmp_path, staged):
    land, batches = staged
    _stage(spark, land, batches)
    root = str(tmp_path / "models_table")

    stream = (
        spark.readStream.schema("name string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{land}/arrival_*")
    )
    ingest.run_upsert_stream(
        stream, root, keys=["name"], schema_ddl=SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    got = ingest.read_table(spark, root, SCHEMA)
    rows = {r["name"]: r["id"] for r in got.collect()}

    # same key set as the one-shot batch upsert
    batch_all = spark.createDataFrame(
        [(n,) for b in batches for n in b], "name string"
    )
    expect = write_ops.upsert(
        spark.createDataFrame([], SCHEMA), batch_all, keys=["name"]
    )
    assert set(rows) == {r["name"] for r in expect.collect()} == {
        "m0", "m1", "m2", "m3", "m4", "m5"
    }
    # dense unique ids regardless of arrival batching
    assert sorted(rows.values()) == list(range(1, 7))
    # earlier arrivals hold smaller ids (allocation is append-only)
    assert rows["m0"] < rows["m3"] < rows["m4"]


def test_retried_epoch_is_a_no_op(spark, tmp_path, staged):
    land, batches = staged
    root = str(tmp_path / "models_table")
    sink = ingest.upsert_sink(root, keys=["name"], schema_ddl=SCHEMA)

    for i, names in enumerate(batches):
        sink(spark.createDataFrame([(n,) for n in names], "name string"), i)
    before = sorted(
        map(tuple, ingest.read_table(spark, root, SCHEMA).collect())
    )
    v_before = ingest.current_version(root)

    # at-least-once: epoch 1 is delivered again after a "failure"
    sink(spark.createDataFrame([(n,) for n in batches[1]], "name string"), 1)

    after_df = ingest.read_table(spark, root, SCHEMA)
    assert sorted(map(tuple, after_df.collect())) == before
    # a new version was committed (the sink doesn't special-case no-ops)
    # but its contents are identical — exactly-once state, not log
    assert ingest.current_version(root) != v_before


def test_reader_sees_only_committed_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = ingest.upsert_sink(root, keys=["name"], schema_ddl=SCHEMA)
    sink(spark.createDataFrame([("a",)], "name string"), 0)
    v1 = ingest.current_version(root)
    old = spark.read.parquet(os.path.join(root, v1))  # reader pins v1

    sink(spark.createDataFrame([("b",)], "name string"), 1)
    assert ingest.current_version(root) != v1
    # pinned reader still resolves: old files are never rewritten
    assert [r["name"] for r in old.collect()] == ["a"]
    assert ingest.read_table(spark, root, SCHEMA).count() == 2


def test_crashed_commit_is_repaired_by_retry(spark, tmp_path):
    """A crash BETWEEN the version write and the pointer swap leaves an
    orphaned version directory the pointer never names. The retried
    commit must rewrite that directory and succeed — not error on the
    leftover — and readers must end on the retried contents."""
    root = str(tmp_path / "t")
    sink = ingest.upsert_sink(root, keys=["name"], schema_ddl=SCHEMA)
    sink(spark.createDataFrame([("a",)], "name string"), 0)
    assert ingest.current_version(root) == "v000001"

    # simulate the crash: v000002 written (with stale content), pointer
    # never swapped
    spark.createDataFrame([(99, "stale")], SCHEMA).write.parquet(
        os.path.join(root, "v000002")
    )
    assert ingest.current_version(root) == "v000001"

    sink(spark.createDataFrame([("b",)], "name string"), 1)
    assert ingest.current_version(root) == "v000002"
    got = sorted(
        r["name"] for r in ingest.read_table(spark, root, SCHEMA).collect()
    )
    assert got == ["a", "b"]  # stale orphan fully replaced


def test_streamed_source_dim_feeds_search_pipeline(spark, tmp_path):
    """End-to-end: stream source metadata in, then use the committed dim
    in a null-safe lookup (the reference's U2 read side)."""
    root = str(tmp_path / "sources")
    ddl = "id long, model_id long, author string, title string, year int"
    sink = ingest.upsert_sink(
        root, keys=list(write_ops.SOURCE_UNIQUE_KEYS), schema_ddl=ddl
    )
    b1 = spark.createDataFrame(
        [(1, "Dick", "Second Variety", 1953), (1, None, "Anon Tract", None)],
        "model_id long, author string, title string, year int",
    )
    sink(b1, 0)
    sink(b1, 1)  # duplicate delivery
    dim = ingest.read_table(spark, root, ddl)
    assert dim.count() == 2
    # null-safe key lookup finds the NULL-keyed row exactly once
    hit = dim.filter(
        F.col("author").eqNullSafe(F.lit(None).cast("string"))
        & (F.col("title") == "Anon Tract")
    )
    assert hit.count() == 1


def test_vacuum_keeps_current_and_window(spark, tmp_path):
    """vacuum_versions deletes only versions strictly older than the
    retained window; the committed state is untouched and re-readable."""
    root = str(tmp_path / "tbl")
    for i in range(5):
        df = spark.createDataFrame([(i, f"r{i}")], "id long, name string")
        ingest.commit_table(df, root)
    assert ingest.list_versions(root) == [f"v{n:06d}" for n in range(1, 6)]
    deleted = ingest.vacuum_versions(root, keep=2)
    assert deleted == ["v000001", "v000002", "v000003"]
    assert ingest.list_versions(root) == ["v000004", "v000005"]
    assert ingest.current_version(root) == "v000005"
    got = ingest.read_table(spark, root, "id long, name string").collect()
    assert [(r["id"], r["name"]) for r in got] == [(4, "r4")]
    # idempotent; keep=1 retains only the current version
    assert ingest.vacuum_versions(root, keep=2) == []
    assert ingest.vacuum_versions(root, keep=1) == ["v000004"]


def test_vacuum_spares_versions_newer_than_pointer(spark, tmp_path):
    """An orphan directory NEWER than _CURRENT (a commit in flight or a
    crash between write and swap) is never deleted."""
    import os

    root = str(tmp_path / "tbl")
    for i in range(3):
        df = spark.createDataFrame([(i, "x")], "id long, name string")
        ingest.commit_table(df, root)
    # roll the pointer back to v2, leaving v3 as the in-flight orphan
    with open(os.path.join(root, "_CURRENT"), "w", encoding="utf-8") as fh:
        fh.write("v000002")
    deleted = ingest.vacuum_versions(root, keep=1)
    assert deleted == ["v000001"]
    assert ingest.list_versions(root) == ["v000002", "v000003"]


def test_time_travel_and_compaction(spark, tmp_path):
    """Version N stays readable after later commits (time travel);
    compaction rewrites the current version into the target file count
    with IDENTICAL content and commits it as a new version; vacuum then
    reclaims the fragmented history."""
    from demo_pgvector_spark.streaming import ingest

    root = str(tmp_path / "tbl")
    ddl = "id long, k string"
    v1 = ingest.commit_table(
        spark.createDataFrame([(1, "a")], ddl).repartition(8), root
    )
    v2 = ingest.commit_table(
        spark.createDataFrame([(1, "a"), (2, "b")], ddl).repartition(8), root
    )
    old = ingest.read_table_at(spark, root, ddl, v1)
    assert [tuple(r) for r in old.collect()] == [(1, "a")]
    v3, n_files = ingest.compact_table(spark, root, ddl, target_rows_per_file=10)
    assert n_files == 1
    assert ingest.current_version(root) == v3
    now = ingest.read_table(spark, root, ddl)
    assert sorted(tuple(r) for r in now.collect()) == [(1, "a"), (2, "b")]
    # history: v1 v2 v3; vacuum to the current + 1 predecessor
    doomed = ingest.vacuum_versions(root, keep=2)
    assert doomed == [v1]
    assert ingest.read_table_at(spark, root, ddl, v2) is not None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ingest.read_table_at(spark, root, ddl, v1)


def test_delta_commit_matches_whole_commit_and_links_files(spark, tmp_path):
    """commit_table(delta=True) — the add-files commit for grow-only
    tables (guide §6): content equals the whole-table rewrite, the
    previous version's data files are HARDLINKED into the new version
    (write job is O(delta), not O(table)), and vacuuming the old
    version unlinks names without touching bytes the new version still
    references."""
    root = str(tmp_path / "t")
    ddl = "id long, name string"
    ingest.commit_table(
        spark.createDataFrame([(1, "a"), (2, "b")], ddl), root
    )
    v1 = ingest.current_version(root)
    v1_files = {
        f
        for f in os.listdir(os.path.join(root, v1))
        if f.endswith(".parquet")
    }
    assert v1_files

    ingest.commit_table(
        spark.createDataFrame([(3, "c")], ddl), root, delta=True
    )
    v2 = ingest.current_version(root)
    got = sorted(map(tuple, ingest.read_table(spark, root, ddl).collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c")]

    v2_files = {
        f
        for f in os.listdir(os.path.join(root, v2))
        if f.endswith(".parquet")
    }
    # every v1 data file is carried as a hardlink (same inode — no
    # rewrite), and the delta landed as at least one NEW file
    assert v1_files < v2_files
    for f in v1_files:
        assert os.path.samefile(
            os.path.join(root, v1, f), os.path.join(root, v2, f)
        )

    ingest.vacuum_versions(root, keep=1)
    assert ingest.list_versions(root) == [v2]
    assert (
        sorted(map(tuple, ingest.read_table(spark, root, ddl).collect()))
        == got
    )


def test_delta_commit_repairs_crash_orphan(spark, tmp_path):
    """A crash between a delta commit's write and its pointer swap
    leaves an orphan directory (links + partial appends); the retried
    delta commit rebuilds it from scratch and lands the same content."""
    root = str(tmp_path / "t")
    ddl = "id long, name string"
    ingest.commit_table(spark.createDataFrame([(1, "a")], ddl), root)
    # simulate the crash: v000002 exists with garbage, pointer unswapped
    spark.createDataFrame([(99, "stale")], ddl).write.parquet(
        os.path.join(root, "v000002")
    )
    assert ingest.current_version(root) == "v000001"

    ingest.commit_table(
        spark.createDataFrame([(2, "b")], ddl), root, delta=True
    )
    assert ingest.current_version(root) == "v000002"
    got = sorted(map(tuple, ingest.read_table(spark, root, ddl).collect()))
    assert got == [(1, "a"), (2, "b")]


def test_upsert_sink_delta_version_is_content_identical(spark, tmp_path):
    """The upsert sink's add-files commit (novel rows only + hardlinks)
    produces version content identical to the old whole-rewrite
    (existing ∪ allocated-novel), including on a retried no-novel epoch."""
    root = str(tmp_path / "t")
    sink = ingest.upsert_sink(root, keys=["name"], schema_ddl=SCHEMA)
    sink(spark.createDataFrame([("a",), ("b",)], "name string"), 0)
    sink(spark.createDataFrame([("b",), ("c",)], "name string"), 1)
    got = {
        r["name"]: r["id"]
        for r in ingest.read_table(spark, root, SCHEMA).collect()
    }
    assert got == {"a": 1, "b": 2, "c": 3}
    # retried epoch: no novel keys -> content-identical new version
    sink(spark.createDataFrame([("b",), ("c",)], "name string"), 1)
    again = {
        r["name"]: r["id"]
        for r in ingest.read_table(spark, root, SCHEMA).collect()
    }
    assert again == got
