"""Atomic scratch-fixture publishing (plans/formats.py).

Round 8/9 post-mortem: a pinned-head fixture guard that trusts "head
version matches" alone can serve a complete-LOOKING but wrong table
forever (e.g. a build interrupted by the pre-atomic rmtree-in-place
pattern, or a table built by older fixture code). These tests pin the
two properties that close that trap:

- a wrong-data table at the RIGHT head version is rebuilt, because
  reuse additionally requires the build fingerprint stamped at swap
  time (``_fixture_current``);
- the publish itself is two renames, never an in-place mutation, with
  crash orphans swept and the previous table restored on swap failure.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import txn
from qb_data_pipeline_backfill_spark.plans import formats


def _build_tiny(spark):
    def build(p: str) -> None:
        df = spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        txn.commit_append(spark, df, p, key="k")
        txn.commit_delete(
            spark, df.filter(F.col("k") % 5 == 0).select("k"), p, key="k"
        )

    return build


def test_atomic_rebuild_stamps_fingerprint(spark, tmp_path):
    path = str(tmp_path / "t")
    formats._atomic_rebuild(path, 1, _build_tiny(spark), rev="test-1")
    assert txn.current_version(path) == 1
    assert formats._fixture_current(path, 1, "test-1")
    assert not formats._fixture_current(path, 1, "test-2")
    with open(formats._fixture_meta_path(path)) as f:
        assert json.load(f) == {"rev": "test-1", "version": 1}
    assert txn.read_table(spark, path).count() == 8


def test_wrong_data_at_right_head_is_rebuilt(spark, tmp_path):
    """THE round-8 corruption scenario: a table whose head version
    matches the pin but whose contents are wrong (here: a legacy
    build with no fingerprint, data tampered) must be rebuilt, not
    served."""
    path = str(tmp_path / "t")
    build = _build_tiny(spark)
    # legacy-style build: correct head, but no fingerprint stamp
    build(path)
    assert txn.current_version(path) == 1
    # tamper: swap in a wrong data file under every parquet name,
    # keeping the manifests (and so the head version) intact
    wrong = str(tmp_path / "wrong")
    spark.range(3).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    ).coalesce(1).write.parquet(wrong)
    (wrong_file,) = [
        os.path.join(wrong, n)
        for n in os.listdir(wrong)
        if n.endswith(".parquet")
    ]
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                shutil.copyfile(wrong_file, os.path.join(root, n))
    # pre-fingerprint code would serve the tampered table forever;
    # the fingerprint check rebuilds it
    formats._atomic_rebuild(path, 1, build, rev="test-1")
    got = sorted(
        r["k"] for r in txn.read_table(spark, path).select("k").collect()
    )
    assert got == [1, 2, 3, 4, 6, 7, 8, 9]


def test_stale_rev_is_rebuilt(spark, tmp_path):
    """Bumping _FIXTURE_REV (new builder code) invalidates every
    cached fixture even though head versions still match."""
    path = str(tmp_path / "t")
    build = _build_tiny(spark)
    formats._atomic_rebuild(path, 1, build, rev="test-1")
    meta0 = os.path.getmtime(formats._fixture_meta_path(path))
    formats._atomic_rebuild(path, 1, build, rev="test-1")  # reused
    assert os.path.getmtime(formats._fixture_meta_path(path)) == meta0
    formats._atomic_rebuild(path, 1, build, rev="test-2")  # rebuilt
    assert formats._fixture_current(path, 1, "test-2")


def test_build_head_drift_raises(spark, tmp_path):
    """A build that reaches a head other than the pin is a coding
    error (pin and build diverged) and must fail loudly, never be
    published."""
    path = str(tmp_path / "t")
    with pytest.raises(RuntimeError, match="expected 7"):
        formats._atomic_rebuild(path, 7, _build_tiny(spark), rev="test-1")
    assert not os.path.exists(path)


def test_swap_failure_restores_previous_table(spark, tmp_path, monkeypatch):
    """If the second rename fails mid-swap, the previous good table is
    put back before the error propagates (ADVICE r9: never strand a
    good table at .old-<pid>)."""
    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "_txn"))
    with open(os.path.join(path, "_txn", "v000000.json"), "w") as f:
        f.write("{}")
    tmp = str(tmp_path / "t.building-X")
    os.makedirs(tmp)

    real_rename = os.rename
    calls = {"n": 0}

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the tmp -> path rename
            raise OSError("injected")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky)
    with pytest.raises(OSError, match="injected"):
        formats._swap_into_place(tmp, path)
    monkeypatch.undo()
    assert os.path.isdir(os.path.join(path, "_txn"))  # restored
    assert not any(
        n.startswith("t.old-") for n in os.listdir(str(tmp_path))
    )


def test_sweep_removes_only_stale_orphans(tmp_path, monkeypatch):
    """Staleness keys on max(mtime, ctime): utime/rename can't age
    ctime on Linux, so 'stale' is simulated by shrinking the window
    below zero (cutoff in the future) — which must still never touch
    a sibling of a DIFFERENT fixture."""
    path = str(tmp_path / "t")
    orphan_build = str(tmp_path / "t.building-123")
    orphan_old = str(tmp_path / "t.old-456")
    other = str(tmp_path / "t2.building-789")
    for d in (orphan_build, orphan_old, other):
        os.makedirs(d)
    # default window: everything is young -> nothing swept
    formats._sweep_stale_siblings(path)
    assert os.path.exists(orphan_build) and os.path.exists(orphan_old)
    # window below zero: every `t` orphan is past the cutoff
    monkeypatch.setattr(formats, "_STALE_AFTER_S", -10.0)
    formats._sweep_stale_siblings(path)
    assert not os.path.exists(orphan_build)
    assert not os.path.exists(orphan_old)
    assert os.path.exists(other)  # different fixture: untouched


def test_sweep_spares_freshly_renamed_old_of_ancient_table(tmp_path):
    """os.rename preserves a directory's MTIME, so a just-moved-aside
    .old-<pid> of an hours-old table looks ancient by mtime; the
    sweeper must see the rename's CTIME bump and spare it (a
    concurrent sweep here would break _swap_into_place's
    restore-on-failure)."""
    import time as _time

    table = str(tmp_path / "t")
    os.makedirs(table)
    ancient = _time.time() - 10 * formats._STALE_AFTER_S
    os.utime(table, (ancient, ancient))
    # ctime is NOW after utime on Linux; emulate the worst case by
    # checking the rename path directly: mtime stays ancient
    old = str(tmp_path / "t.old-999")
    os.rename(table, old)
    assert os.path.getmtime(old) < _time.time() - formats._STALE_AFTER_S
    formats._sweep_stale_siblings(str(tmp_path / "t"))
    assert os.path.exists(old)  # spared: ctime says it moved just now
