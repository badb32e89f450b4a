"""Cross-engine-deterministic column expression helpers."""

from qb_data_pipeline_backfill_spark.functions.numeric import decimal_sum

__all__ = ["decimal_sum"]
