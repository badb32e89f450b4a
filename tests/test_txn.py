"""Transactional manifest table: atomicity, idempotence, isolation,
time travel, conflict detection, vacuum safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import txn


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_commit_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    v = txn.commit_append(spark, _df(spark, 0, 100), path)
    assert v == 0
    got = txn.read_table(spark, path)
    assert got.count() == 100
    assert {f.name for f in got.schema} == {"k", "v"}


def test_keyed_append_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 100), path, key="k")
    # replay the same batch + 50 new keys: only the new keys land
    txn.commit_append(spark, _df(spark, 0, 150), path, key="k")
    got = txn.read_table(spark, path)
    assert got.count() == 150
    assert got.filter(F.col("k") == 42).count() == 1


def test_staged_but_unpublished_files_are_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 10), path)
    # crash simulation: data files exist but no manifest references them
    _df(spark, 1000, 2000).write.parquet(os.path.join(path, "_staging", "crashed"))
    for name in os.listdir(os.path.join(path, "_staging", "crashed")):
        if name.endswith(".parquet"):
            os.link(
                os.path.join(path, "_staging", "crashed", name),
                os.path.join(path, "data", f"orphan-{name}"),
            )
    assert txn.read_table(spark, path).count() == 10
    removed = txn.vacuum(path)
    assert any(n.startswith("orphan-") for n in removed)
    assert txn.read_table(spark, path).count() == 10


def test_time_travel_pins_old_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 10), path)
    txn.commit_append(spark, _df(spark, 10, 30), path)
    assert txn.read_version(spark, path, 0).count() == 10
    assert txn.read_version(spark, path, 1).count() == 30


def test_concurrent_commit_conflict_detected(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 10), path)
    # two writers validated against base 0; the first publishes v1,
    # the second's compare-and-swap publish must fail, not overwrite
    txn.commit_append(spark, _df(spark, 10, 20), path, expected_base=0)
    with pytest.raises(txn.ConcurrentCommitError):
        txn.commit_append(spark, _df(spark, 20, 30), path, expected_base=0)
    assert txn.read_table(spark, path).count() == 20


def test_reader_snapshot_survives_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 10), path)
    pinned = txn.read_table(spark, path)  # manifest resolved NOW
    txn.commit_append(spark, _df(spark, 10, 1000), path)
    # the pinned plan scans only version-0 files even executed later
    assert pinned.count() == 10


def test_upsert_replaces_and_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 10), path)
    updates = spark.range(5, 15).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    v = txn.commit_upsert(spark, updates, path, key="k")
    assert v == 1
    got = txn.read_table(spark, path)
    assert got.count() == 15
    assert got.filter(F.col("v") == -1).count() == 10
    assert got.filter((F.col("k") == 3) & (F.col("v") == 30)).count() == 1
    # time travel still sees the pre-merge snapshot
    assert txn.read_version(spark, path, 0).filter(F.col("v") == -1).count() == 0


def test_streaming_into_txn_table_is_exactly_once(spark, tmp_path):
    from qb_data_pipeline_backfill_spark.streaming import events_stream
    from qb_data_pipeline_backfill_spark.operators.txn import stream_to_txn

    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    src = events_stream(spark, "/root/testdata/sf0.001").select(
        F.col("event_id").alias("k"), "event_type", "value"
    )
    q = stream_to_txn(src, path, key="k", checkpoint_dir=ck)
    q.awaitTermination()
    n = txn.read_table(spark, path).count()
    # replay the whole stream from a FRESH checkpoint: keyed commit
    # inserts zero, version advances, count is unchanged
    q2 = stream_to_txn(src, path, key="k", checkpoint_dir=str(tmp_path / "ck2"))
    q2.awaitTermination()
    assert txn.read_table(spark, path).count() == n


def test_compaction_preserves_rows_atomically(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    for lo in range(0, 50, 10):  # 5 commits -> many small files
        txn.commit_append(spark, _df(spark, lo, lo + 10), path)
    before = txn.read_table(spark, path)
    n_files_before = len(txn._read_manifest(path, txn.current_version(path))["files"])
    v = txn.commit_compact(spark, path, target_partitions=1)
    man = txn._read_manifest(path, v)
    assert len(man["files"]) < n_files_before
    after = txn.read_table(spark, path)
    assert after.count() == before.count() == 50
    # pre-compaction snapshot still readable (time travel intact)
    assert txn.read_version(spark, path, v - 1).count() == 50


def test_delete_by_key_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 100), path)
    to_forget = spark.range(0, 100, 3).select(F.col("id").alias("k"))
    v = txn.commit_delete(spark, to_forget, path, key="k")
    got = txn.read_table(spark, path)
    assert got.count() == 100 - 34
    assert got.filter(F.col("k") % 3 == 0).count() == 0
    # old snapshot still has them until manifests are retired
    assert txn.read_version(spark, path, v - 1).count() == 100


def test_additive_schema_evolution_on_append(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_append(spark, _df(spark, 0, 10), path)
    widened = spark.range(10, 20).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit("en").alias("lang"),
    )
    txn.commit_append(spark, widened, path)
    got = txn.read_table(spark, path)
    # latest manifest's schema governs; old files surface NULL for the
    # added column (parquet read-by-name with an explicit schema)
    assert {f.name for f in got.schema} == {"k", "v", "lang"}
    assert got.filter(F.col("lang").isNull()).count() == 10
    assert got.filter(F.col("lang") == "en").count() == 10


def test_cow_upsert_rewrites_only_overlapping_files(spark):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        # three appends with disjoint sorted key ranges -> three file
        # sets with disjoint zone maps
        for lo in (0, 1000, 2000):
            txn.commit_append_with_stats(
                spark, _df(spark, lo, lo + 100).coalesce(1), path, key="k"
            )
        man_before = txn._read_manifest(path, txn.current_version(path))
        # update keys only in the middle range
        updates = spark.range(1050, 1060).select(
            F.col("id").alias("k"), F.lit(-1).alias("v")
        )
        v = txn.commit_upsert_cow(spark, updates, path, key="k")
        man_after = txn._read_manifest(path, v)
        carried = set(man_before["files"]) & set(man_after["files"])
        # the two non-overlapping ranges moved forward BY REFERENCE
        assert len(carried) >= 2
        got = txn.read_table(spark, path)
        assert got.count() == 300
        assert got.filter(F.col("v") == -1).count() == 10
        assert got.filter((F.col("k") == 5) & (F.col("v") == 50)).count() == 1


def test_zone_map_read_skips_files(spark):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        for lo in (0, 1000, 2000):
            txn.commit_append_with_stats(
                spark, _df(spark, lo, lo + 100).coalesce(1), path, key="k"
            )
        scanned, total = txn.pruned_file_count(path, 1010, 1020)
        assert scanned < total
        got = txn.read_table_where(spark, path, 1010, 1020)
        assert got.count() == 11
        assert {r.k for r in got.collect()} == set(range(1010, 1021))


def test_cow_upsert_inserts_new_key_range(spark):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        txn.commit_append_with_stats(
            spark, _df(spark, 0, 100).coalesce(1), path, key="k"
        )
        # update batch entirely OUTSIDE existing ranges: pure insert
        inserts = spark.range(5000, 5010).select(
            F.col("id").alias("k"), F.lit(7).cast("long").alias("v")
        )
        txn.commit_upsert_cow(spark, inserts, path, key="k")
        got = txn.read_table(spark, path)
        assert got.count() == 110
        assert got.filter(F.col("v") == 7).count() == 10
