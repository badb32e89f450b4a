"""REST batch sink (Python DataSource writer): parallel batch POSTs,
server-side idempotent upsert, replay inserts zero."""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.sources.rest_sink import RestBatchSink
from qb_data_pipeline_backfill_spark.sources.stub_qbo import StubIngestServer


def _df(spark, n=250):
    return spark.range(n).select(
        F.col("id").cast("string").alias("Id"),
        F.concat(F.lit("name-"), F.col("id")).alias("DisplayName"),
        (F.col("id") % 7).cast("int").alias("NationRef"),
    )


def test_writes_all_rows_in_batches(spark):
    srv = StubIngestServer()
    try:
        spark.dataSource.register(RestBatchSink)
        _df(spark).repartition(4).write.format("qbo_rest_sink").option(
            "base_url", srv.base_url
        ).option("batch_size", "50").mode("append").save()
        assert len(srv.records) == 250
        assert srv.records["17"]["DisplayName"] == "name-17"
        # 250 rows / batches of <=50 across 4 partitions -> >= 5 POSTs
        assert srv.n_requests >= 5
    finally:
        srv.close()


def test_replay_is_idempotent_by_id(spark):
    srv = StubIngestServer()
    try:
        spark.dataSource.register(RestBatchSink)
        w = (
            _df(spark)
            .write.format("qbo_rest_sink")
            .option("base_url", srv.base_url)
            .mode("append")
        )
        w.save()
        n1 = len(srv.records)
        w.save()  # full replay: upsert by Id creates nothing new
        assert len(srv.records) == n1 == 250
    finally:
        srv.close()


def test_overwrite_mode_rejected(spark):
    srv = StubIngestServer()
    try:
        spark.dataSource.register(RestBatchSink)
        import pytest
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception, match="append-only|Py4J|overwrite"):
            _df(spark).write.format("qbo_rest_sink").option(
                "base_url", srv.base_url
            ).mode("overwrite").save()
    finally:
        srv.close()


def test_typed_columns_serialize(spark):
    """Rows with timestamp/date/decimal columns pass the schema check,
    so the JSON encoding must not blow up at write time — they land as
    ISO / decimal strings via the typed-default encoder."""
    srv = StubIngestServer()
    try:
        spark.dataSource.register(RestBatchSink)
        df = spark.range(5).select(
            F.col("id").cast("string").alias("Id"),
            F.lit("2024-03-31 12:00:00").cast("timestamp").alias("TxnAt"),
            F.lit("2024-03-31").cast("date").alias("TxnDate"),
            F.lit("12.50").cast("decimal(10,2)").alias("Amount"),
        )
        df.coalesce(1).write.format("qbo_rest_sink").option(
            "base_url", srv.base_url
        ).mode("append").save()
        assert len(srv.records) == 5
        rec = srv.records["3"]
        assert rec["TxnDate"] == "2024-03-31"
        assert rec["Amount"] == "12.50"
        assert rec["TxnAt"].startswith("2024-03-31 12:00:00")
    finally:
        srv.close()
