"""Write-path properties: idempotence, id uniqueness, null-safe matching.

The reference guarantees these through DB transactions + UNIQUE
constraints (src/lib/database.py:58-215, config/init.sql:23); the batch
engine must prove them as algebraic properties instead (SURVEY Q4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_pgvector_spark.operators import write as W


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _models(spark):
    existing = spark.createDataFrame(
        [(1, "alpha", 64), (2, "beta", 64)], "id long, name string, embedding_dim int"
    )
    incoming = spark.createDataFrame(
        [("beta", 128), ("gamma", 128), ("gamma", 256), ("delta", 128)],
        "name string, embedding_dim int",
    )
    return existing, incoming


def test_upsert_models_lookup_and_insert(spark):
    existing, incoming = _models(spark)
    out = W.upsert_models(existing, incoming)
    rows = _rows(out)
    # existing rows untouched; beta not duplicated; gamma deduped to one row
    names = [r[1] for r in rows]
    assert names == ["alpha", "beta", "delta", "gamma"]
    ids = [r[0] for r in rows]
    assert len(set(ids)) == 4
    # allocated ids continue from max existing id, ordered by name
    by_name = {r[1]: r[0] for r in rows}
    assert by_name["alpha"] == 1 and by_name["beta"] == 2
    assert by_name["delta"] == 3 and by_name["gamma"] == 4


def test_upsert_models_idempotent(spark):
    existing, incoming = _models(spark)
    once = W.upsert_models(existing, incoming)
    twice = W.upsert_models(once, incoming)
    assert _rows(once) == _rows(twice)


def test_upsert_sources_nullsafe_key_match(spark):
    schema = (
        "id long, author string, title string, source_type int, url string, "
        "genre string, subgenre string, year int, model_id long"
    )
    existing = spark.createDataFrame(
        [(1, None, "t1", 1, None, None, None, None, 7)], schema
    )
    # same null-safe key (model_id=7, author=NULL, title=t1, year=NULL):
    # must be treated as a match, NOT re-inserted (IS NOT DISTINCT FROM
    # semantics, src/lib/database.py:152-159)
    incoming = spark.createDataFrame(
        [
            (None, "t1", 2, "u", "g", None, None, 7),
            (None, "t2", 2, "u", "g", None, None, 7),
        ],
        schema.replace("id long, ", ""),
    )
    out = W.upsert_sources(existing, incoming)
    rows = _rows(out)
    assert len(rows) == 2
    titles = sorted(r[2] for r in rows)
    assert titles == ["t1", "t2"]
    # the matched key kept its original row (source_type 1, not 2)
    t1 = next(r for r in rows if r[2] == "t1")
    assert t1[0] == 1 and t1[3] == 1


def test_upsert_sources_idempotent_on_testdata(spark, sf_dir):
    from demo_pgvector_spark import registry

    once = registry.q_upsert_source(spark, sf_dir)
    # re-apply the same incoming batch against the upserted table
    staged = registry._staged_sources(spark, sf_dir)
    incoming = staged.filter((F.col("k") >= 50) & (F.col("k") <= 450))
    twice = W.upsert_sources(once, incoming, batch_order=("k",))
    assert _rows(once) == _rows(twice)


def test_append_chunks_shared_ids(spark):
    existing = spark.createDataFrame(
        [(5, 1, 1, [0.1, 0.2])],
        "id long, source_id long, model_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (2, 1, [0.3, 0.4], 0, '{"n":0}', "b"),
            (1, 1, [0.5, 0.6], 0, '{"n":1}', "a"),
        ],
        "source_id long, model_id long, embedding array<double>, "
        "chunk_number int, metadata string, chunk_text string",
    )
    chunks, chunk_data = W.append_chunks(existing, batch)
    c = {r["id"]: r for r in chunks.collect()}
    d = {r["chunk_id"]: r for r in chunk_data.collect()}
    # ids continue past max(existing)=5, allocated by (source_id, chunk_number)
    assert sorted(c) == [6, 7] and sorted(d) == [6, 7]
    assert d[6]["chunk_text"] == "a" and c[6]["source_id"] == 1
    assert d[7]["chunk_text"] == "b" and c[7]["source_id"] == 2


# ---------------------------------------------------------------------------
# SCD2 dimension maintenance (write.scd2_apply)
# ---------------------------------------------------------------------------


def _scd2_fixture(spark):
    from pyspark.sql import functions as F  # noqa: F401

    dim = spark.createDataFrame(
        [
            # key 1: has history + a current row
            (1, "alice", 10.0, "1990-01-01", "1992-01-01", False),
            (1, "alice", 20.0, "1992-01-01", None, True),
            # key 2: current only, will change
            (2, "bob", 5.0, "1992-01-01", None, True),
            # key 3: current only, batch repeats it verbatim
            (3, "carol", 7.0, "1992-01-01", None, True),
        ],
        "k long, name string, bal double, valid_from string,"
        " valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            (2, "bob", 6.0),  # changed attr -> close + insert
            (3, "carol", 7.0),  # identical -> no-op
            (4, "dave", 1.0),  # new key -> first insert
        ],
        "k long, name string, bal double",
    )
    return dim, changes


def test_scd2_three_verdicts(spark):
    from demo_pgvector_spark.operators import write

    dim, changes = _scd2_fixture(spark)
    out = write.scd2_apply(
        dim, changes, ("k",), ("name", "bal"), "1995-06-01"
    )
    rows = sorted(
        tuple(r) for r in out.collect()
    )
    assert rows == sorted(
        [
            (1, "alice", 10.0, "1990-01-01", "1992-01-01", False),  # history
            (1, "alice", 20.0, "1992-01-01", None, True),  # untouched
            (2, "bob", 5.0, "1992-01-01", "1995-06-01", False),  # closed
            (2, "bob", 6.0, "1995-06-01", None, True),  # new version
            (3, "carol", 7.0, "1992-01-01", None, True),  # no-op
            (4, "dave", 1.0, "1995-06-01", None, True),  # first insert
        ]
    )


def test_scd2_reapply_is_noop(spark):
    """Idempotence: applying the SAME batch to the already-updated table
    changes nothing — every matched key now compares equal, every new
    key exists."""
    from demo_pgvector_spark.operators import write

    dim, changes = _scd2_fixture(spark)
    once = write.scd2_apply(
        dim, changes, ("k",), ("name", "bal"), "1995-06-01"
    )
    twice = write.scd2_apply(
        once, changes, ("k",), ("name", "bal"), "1999-01-01"
    )
    assert sorted(tuple(r) for r in once.collect()) == sorted(
        tuple(r) for r in twice.collect()
    )


def test_scd2_exactly_one_current_row_per_key(spark):
    from pyspark.sql import functions as F

    from demo_pgvector_spark.operators import write

    dim, changes = _scd2_fixture(spark)
    out = write.scd2_apply(
        dim, changes, ("k",), ("name", "bal"), "1995-06-01"
    )
    per_key = (
        out.groupBy("k")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
        .collect()
    )
    assert all(r["n_cur"] == 1 for r in per_key), per_key


def test_scd2_sink_epochs_compose_and_retry_is_noop(spark, tmp_path):
    """streaming/ingest.py scd2_sink: disjoint-key epoch batches must
    compose to the one-shot batch apply, and a retried epoch must not
    move the table (scd2_apply idempotence carried to the sink)."""
    from demo_pgvector_spark.operators import write
    from demo_pgvector_spark.streaming import ingest as singest

    dim, changes = _scd2_fixture(spark)
    schema = (
        "k long, name string, bal double, valid_from string,"
        " valid_to string, is_current boolean"
    )
    root = str(tmp_path / "dim")
    sink = singest.scd2_sink(
        root, ("k",), ("name", "bal"), schema, "1995-06-01", seed=dim
    )
    rows = changes.collect()
    for epoch in range(3):  # one change-row per epoch, keys disjoint
        sink(
            spark.createDataFrame([rows[epoch]], changes.schema), epoch
        )

    def table():
        return sorted(
            tuple(r) for r in singest.read_table(spark, root, schema).collect()
        )

    whole = sorted(
        tuple(r)
        for r in write.scd2_apply(
            dim, changes, ("k",), ("name", "bal"), "1995-06-01"
        ).collect()
    )
    assert table() == whole

    sink(spark.createDataFrame([rows[1]], changes.schema), 1)  # retry
    assert table() == whole
