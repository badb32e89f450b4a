"""Streaming change-data-capture source over the transactional table:
``spark.readStream.format("txn_cdf")`` tails the manifest log and
emits each version step's NET row changes as (row..., _change_type)
micro-batches — the streaming face of ``operators/txn.table_changes``
(Delta CDF-as-stream analog), built on Spark 4's Python streaming
DataSource API.

Exactly-once comes from the offset being the table VERSION: the
streaming checkpoint records {"version": N}; a restarted query replays
``readBetweenOffsets`` over the same immutable manifests and gets
byte-identical batches, because manifests and data files are never
mutated.

Scale posture: a batch is computed from the MANIFEST DIFF only —
rows of added files, rows of removed files, and newly added
deletion-vector entries — so batch cost is O(changed files), never a
table scan. Carried files are never read. The net diff (rewritten-
identical rows in a compaction cancel out; an upsert's rewritten file
pair nets to just the updated keys) is keyed on the table's stats/DV
key, computed driver-side over the changed-file rows via pyarrow —
the same bounded-batch posture as any file-listing streaming source.

Retention interaction (document like Delta CDF's): a consumer lagging
past ``expire_manifests`` + ``vacuum`` loses the removed files its
next batch needs and gets a loud FileNotFoundError — size retention
to the slowest consumer.

Options: path (required), key (defaults to the manifest's
stats_col/dv_key), start_version (default -1 = from genesis).
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

from qb_data_pipeline_backfill_spark.operators.txn import (
    _read_manifest,
    current_version,
)


def _rows_of(path: str, names: list[str], columns: list[str]) -> list[dict]:
    import pyarrow.parquet as pq

    out: list[dict] = []
    for n in names:
        t = pq.read_table(os.path.join(path, "data", n))
        for r in t.to_pylist():
            out.append({c: r.get(c) for c in columns})
    return out


def _dv_rows(path: str, dv_names: list[str]) -> list[dict]:
    import pyarrow.parquet as pq

    out: list[dict] = []
    for n in dv_names:
        out.extend(pq.read_table(os.path.join(path, "data", n)).to_pylist())
    return out


class TxnCdfStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._path = options["path"]
        self._key = options.get("key")
        self._start = int(options.get("start_version", -1))

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        head = current_version(self._path)
        if head <= start["version"]:
            return iter([]), start
        end = {"version": head}
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._net_changes(start["version"], end["version"]))

    def commit(self, end: dict) -> None:
        pass

    # -- manifest-log diff -------------------------------------------------
    def _net_changes(self, v0: int, v1: int) -> list[tuple]:
        man1 = _read_manifest(self._path, v1)
        man0 = _read_manifest(self._path, v0) if v0 >= 0 else {}
        key = self._key or man1.get("stats_col") or man1.get("dv_key")
        if key is None:
            raise ValueError("txn_cdf needs key= (table has no stats/dv key)")
        columns = [f.split(" ")[0] for f in man1["schema_ddl"].split(", ")]

        f0, f1 = set(man0.get("files", [])), set(man1["files"])
        added = sorted(f1 - f0)
        removed = sorted(f0 - f1)
        dv0, dv1 = set(man0.get("dvs", [])), set(man1.get("dvs", []))
        new_dvs = sorted(dv1 - dv0)

        # visibility-aware row sets for the CHANGED files only
        def dv_suppressed(dv_names: set, file_names: set) -> set:
            sup = set()
            for r in _dv_rows(self._path, sorted(dv_names)):
                if r["file_name"] in file_names:
                    sup.add((r["file_name"], r[key]))
            return sup

        # rows that LEFT the snapshot: removed files' rows visible at
        # v0, plus rows of carried files newly covered by a DV
        sup0 = dv_suppressed(dv0, f0)
        old_gone: dict = {}
        for n in removed:
            for r in _rows_of(self._path, [n], columns):
                if (n, r[key]) not in sup0:
                    old_gone[r[key]] = r
        carried = f0 & f1
        sup_new = dv_suppressed(dv1 - dv0, carried)
        if sup_new:
            by_file: dict = {}
            for fn, kv in sup_new:
                by_file.setdefault(fn, set()).add(kv)
            for fn, kvs in by_file.items():
                for r in _rows_of(self._path, [fn], columns):
                    if r[key] in kvs and (fn, r[key]) not in sup0:
                        old_gone[r[key]] = r

        # rows that ENTERED the snapshot: added files' rows visible at v1
        sup1 = dv_suppressed(dv1, f1)
        new_here: dict = {}
        for n in added:
            for r in _rows_of(self._path, [n], columns):
                if (n, r[key]) not in sup1:
                    new_here[r[key]] = r

        out: list[tuple] = []
        for kv, r in sorted(new_here.items(), key=lambda x: str(x[0])):
            old = old_gone.pop(kv, None)
            if old is None:
                out.append(tuple(r[c] for c in columns) + ("insert",))
            elif old != r:
                out.append(tuple(r[c] for c in columns) + ("update",))
            # identical rewrite (compaction): no change emitted
        for kv, r in sorted(old_gone.items(), key=lambda x: str(x[0])):
            out.append(tuple(r[c] for c in columns) + ("delete",))
        return out


class TxnCdfDataSource(DataSource):
    """``spark.readStream.format("txn_cdf").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "txn_cdf"

    def schema(self) -> str:
        man = _read_manifest(
            self.options["path"], current_version(self.options["path"])
        )
        return man["schema_ddl"] + ", _change_type string"

    def simpleStreamReader(self, schema) -> TxnCdfStreamReader:
        return TxnCdfStreamReader(dict(self.options))


def read_cdf_stream(spark, path: str, **options):
    """Register the source (idempotent) and return the lazy stream."""
    spark.dataSource.register(TxnCdfDataSource)
    reader = spark.readStream.format(TxnCdfDataSource.name()).option("path", path)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def apply_cdf_to_table(
    spark,
    source_path: str,
    target_path: str,
    key: str,
    checkpoint_dir: str,
    start_version: int = -1,
):
    """Incremental view maintenance: tail ``source_path``'s change feed
    and apply each batch to a derived txn table — the CDC-replica loop
    (Delta's `MERGE from CDF` pattern) that keeps a downstream
    materialization in sync without ever rescanning the source.

    Per micro-batch: ONE ``commit_merge`` applies the whole batch —
    insert/update rows via the matched-update/not-matched-insert
    clauses, delete rows via the matched-delete clause — so the batch
    lands in a single atomic snapshot switch (the earlier two-commit
    shape exposed a readable intermediate state with updates applied
    but deletes pending). The net-diff contract (each key appears at
    most once per batch) satisfies merge's unique-source-key
    requirement, and the merge is effect-idempotent, so a foreachBatch
    replay after a crash re-applies harmlessly — exactly-once end to
    end on top of at-least-once delivery. Runs with AvailableNow
    (catch-up then stop); returns the started query.
    """
    from qb_data_pipeline_backfill_spark.operators import txn

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        sp = batch_df.sparkSession
        src = batch_df.withColumnRenamed("_change_type", "__op")
        if txn.current_version(target_path) < 0:
            # genesis: publish the (empty) table so merge has a base
            txn.commit_append(sp, src.drop("__op").limit(0), target_path)
        txn.commit_merge(
            sp, src, target_path, key=key, matched_delete="__op = 'delete'"
        )

    return (
        read_cdf_stream(spark, source_path, key=key, start_version=start_version)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
