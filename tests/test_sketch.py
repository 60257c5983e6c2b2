"""Count-min sketch (operators/sketch.py): overestimate guarantee,
exactness under no-collision, and cell-wise mergeability — the property
that makes the sketch an ingest-maintained artifact at scale."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from demo_pgvector_spark.operators import sketch

ITEMS = [i % 7 for i in range(200)] + [999] * 50 + list(range(100, 120))


def _df(spark, items):
    return spark.createDataFrame([(x,) for x in items], "item long")


def test_estimates_overapproximate_and_hit_exact_without_collisions(spark):
    df = _df(spark, ITEMS)
    sk = sketch.countmin_build(df, "item")
    probes = df.select("item").distinct()
    est = {
        r["item"]: r["est"]
        for r in sketch.countmin_estimate(sk, probes, "item").collect()
    }
    truth = Counter(ITEMS)
    assert set(est) == set(truth)
    for k, c in truth.items():
        assert est[k] >= c, (k, est[k], c)
    # w=256 >> 28 distinct items: collisions are possible but the heavy
    # hitter's min-over-4-rows estimate must stay tight
    assert est[999] == truth[999]


def test_sketches_merge_by_cellwise_sum(spark):
    half1, half2 = ITEMS[: len(ITEMS) // 2], ITEMS[len(ITEMS) // 2 :]
    merged = (
        sketch.countmin_build(_df(spark, half1), "item")
        .unionByName(sketch.countmin_build(_df(spark, half2), "item"))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketch.countmin_build(_df(spark, ITEMS), "item")
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in whole.collect())
    assert a == b


def test_unseen_probe_estimates_zero_or_collision(spark):
    df = _df(spark, [1, 2, 3])
    sk = sketch.countmin_build(df, "item")
    probes = _df(spark, [777777])
    [r] = sketch.countmin_estimate(sk, probes, "item").collect()
    assert r["est"] >= 0  # zero unless all 4 rows collide with real items
    assert r["est"] <= 3


def test_streaming_sink_folds_epochs_and_skips_retries(spark, tmp_path):
    """streaming/sketches.py countmin_sink: folding three epoch batches
    must equal the one-shot sketch of their union, and re-applying an
    epoch (foreachBatch retry) must change NOTHING — cell addition is
    not idempotent, so the epoch marker carries the exactly-once
    guarantee."""
    from demo_pgvector_spark.streaming import sketches as ssk

    root = str(tmp_path / "sketch")
    sink = ssk.countmin_sink(root, "item")
    thirds = [ITEMS[0::3], ITEMS[1::3], ITEMS[2::3]]
    for epoch, chunk in enumerate(thirds):
        sink(_df(spark, chunk), epoch)

    def cells():
        return sorted(tuple(r) for r in ssk.read_sketch(spark, root).collect())

    whole = sorted(
        tuple(r) for r in sketch.countmin_build(_df(spark, ITEMS), "item").collect()
    )
    assert cells() == whole

    # retry of every already-applied epoch: table must not move
    for epoch, chunk in enumerate(thirds):
        sink(_df(spark, chunk), epoch)
    assert cells() == whole


def test_streaming_bloom_sink_is_idempotent_bitor(spark, tmp_path):
    """streaming/sketches.py bloom_sink: OR-folding three epoch batches
    must equal the one-shot bloom of their union, and re-applying any
    epoch changes NOTHING — bit-OR is idempotent, so this sink needs no
    epoch marker (contrast countmin_sink)."""
    from demo_pgvector_spark.operators import curation
    from demo_pgvector_spark.streaming import sketches as ssk

    docs = [(i, f"alpha beta gamma delta epsilon zeta eta theta iota "
                f"kappa lam mu word{i} tail{i % 3}") for i in range(9)]

    def _docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    root = str(tmp_path / "bloom")
    sink = ssk.bloom_sink(root)
    for epoch in range(3):
        sink(_docs(docs[epoch::3]), epoch)

    def positions():
        return sorted(r["pos"] for r in ssk.read_bloom(spark, root).collect())

    whole = sorted(
        r["pos"] for r in curation.bloom_build(_docs(docs)).collect()
    )
    assert positions() == whole and len(whole) > 0

    sink(_docs(docs[1::3]), 1)  # retried epoch: table must not move
    assert positions() == whole


def test_countmin_commit_is_crash_atomic(spark, tmp_path, monkeypatch):
    """ADVICE r9: version and epoch marker must commit in ONE atomic
    pointer swap. Inject a crash between the version write (parquet +
    in-directory marker) and the pointer os.replace: the retry of the
    crashed epoch must re-fold it against the still-previous version —
    never double-count — and the final table must equal the one-shot
    sketch. The pre-fix root-level marker failed the mirror-image
    window (pointer swapped, marker stale → retry re-merged)."""
    import os as _os

    from demo_pgvector_spark.streaming import sketches as ssk

    root = str(tmp_path / "sketch")
    sink = ssk.countmin_sink(root, "item")
    thirds = [ITEMS[0::3], ITEMS[1::3], ITEMS[2::3]]
    sink(_df(spark, thirds[0]), 0)

    real_replace = _os.replace
    boom = {"armed": True}

    def crashing_replace(src, dst):
        if boom["armed"] and dst.endswith("_CURRENT") and root in dst:
            boom["armed"] = False
            raise OSError("injected crash before pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr("demo_pgvector_spark.streaming.sketches.os.replace",
                        crashing_replace)
    try:
        sink(_df(spark, thirds[1]), 1)  # crashes: v2 written, pointer still v1
    except OSError:
        pass
    # pointer-visible state is self-consistent: epoch 1 NOT applied
    assert ssk._last_epoch(root) == 0
    sink(_df(spark, thirds[1]), 1)  # retry re-folds epoch 1 exactly once
    sink(_df(spark, thirds[2]), 2)
    got = sorted(tuple(r) for r in ssk.read_sketch(spark, root).collect())
    whole = sorted(
        tuple(r)
        for r in sketch.countmin_build(_df(spark, ITEMS), "item").collect()
    )
    assert got == whole
