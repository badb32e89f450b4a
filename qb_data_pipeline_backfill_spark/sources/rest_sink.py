"""Python DataSource WRITER: batch-POST rows to a REST ingest API.

The read half of the API story is sources/rest.py (paginated QBO-style
scan); this is the write half — ``df.write.format("qbo_rest_sink")``
POSTs JSON record batches from every partition in parallel, the Spark 4
Python DataSource writer path (executor-side ``write(iterator)``,
driver-side ``commit``/``abort`` with per-partition commit messages).

Exactly-once story, matching the engine's sink philosophy
(operators/sink.py, operators/txn.py): the transport is at-least-once
(a retried task re-POSTs its partition), so the PROTOCOL carries the
idempotency — every record ships with its ``Id`` and the server
upserts by Id, making replays harmless. The commit messages report
per-partition posted/created counts; ``commit`` aggregates them,
``abort`` reports what may have partially landed (harmless, by the
idempotency above).

Options: ``base_url`` (required), ``endpoint`` (default /v1/ingest),
``batch_size`` (records per POST, default 100), ``id_field``
(default Id).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class RestSinkCommit(WriterCommitMessage):
    n_posted: int = 0
    n_created: int = 0


class RestBatchSink(DataSource):
    """``spark.dataSource.register(RestBatchSink)`` then
    ``df.write.format("qbo_rest_sink").option("base_url", ...)
    .mode("append").save()``."""

    @classmethod
    def name(cls) -> str:
        return "qbo_rest_sink"

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError("qbo_rest_sink is append-only (idempotent by Id)")
        return RestBatchWriter(self.options, schema)


class RestBatchWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType):
        self.base_url = options.get("base_url")
        if not self.base_url:
            raise ValueError("qbo_rest_sink requires option base_url")
        self.endpoint = options.get("endpoint", "/v1/ingest")
        self.batch_size = int(options.get("batch_size", "100"))
        self.id_field = options.get("id_field", "Id")
        self.columns = [f.name for f in schema.fields]
        if self.id_field not in self.columns:
            raise ValueError(
                f"id column {self.id_field!r} missing from {self.columns}"
            )

    # executor-side: one call per partition
    def write(self, iterator) -> RestSinkCommit:
        import urllib.request

        url = f"{self.base_url}{self.endpoint}"
        posted = created = 0
        buf: list[dict] = []

        def flush() -> None:
            nonlocal posted, created, buf
            if not buf:
                return
            req = urllib.request.Request(
                url,
                # default=str: rows may carry datetime/date/Decimal
                # columns (valid per the schema check in __init__) that
                # json.dumps would otherwise reject at runtime; they
                # serialize as ISO strings / plain decimal text.
                data=json.dumps({"records": buf}, default=str).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                body = json.loads(resp.read().decode())
            posted += len(buf)
            created += int(body.get("created", 0))
            buf = []

        for row in iterator:
            buf.append({c: row[c] for c in self.columns})
            if len(buf) >= self.batch_size:
                flush()
        flush()
        return RestSinkCommit(n_posted=posted, n_created=created)

    # driver-side
    def commit(self, messages) -> None:
        total = sum(m.n_posted for m in messages if m)
        created = sum(m.n_created for m in messages if m)
        # Committed: every partition posted; server-side Id upsert made
        # any task retries idempotent (created <= posted).
        self._last_commit = {"posted": total, "created": created}

    def abort(self, messages) -> None:
        # Partitions that already posted are harmless: re-running the
        # write re-POSTs the same Ids and the server upserts.
        pass
