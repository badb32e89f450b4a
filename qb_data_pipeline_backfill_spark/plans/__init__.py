"""Query plans: named (spark, sf_dir) -> DataFrame callables + DuckDB oracles.

Importing this package populates the registry; each submodule groups
one slice of the engine's surface.
"""

from qb_data_pipeline_backfill_spark.plans import analytics  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import ingestion  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import llm  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import nested  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import relational  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import rest  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import stream_plans  # noqa: F401
from qb_data_pipeline_backfill_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    queries,
)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
