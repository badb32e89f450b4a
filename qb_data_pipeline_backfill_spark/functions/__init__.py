"""Cross-engine-deterministic column expression helpers + skew tools."""

from qb_data_pipeline_backfill_spark.functions.numeric import decimal_avg, decimal_sum, int_ratio
from qb_data_pipeline_backfill_spark.functions.skew import (
    salt_column,
    salted_collect_list,
    salted_join,
)

__all__ = ["decimal_avg", "decimal_sum", "int_ratio", "salt_column", "salted_collect_list", "salted_join"]
