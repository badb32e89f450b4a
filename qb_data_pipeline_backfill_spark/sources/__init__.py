"""Data sources: the QBO-style paginated REST DataSource and helpers."""

from qb_data_pipeline_backfill_spark.sources.rest import (
    OAuth2TokenClient,
    QboRestDataSource,
    read_qbo,
    resolve_base_url,
)

__all__ = ["OAuth2TokenClient", "QboRestDataSource", "read_qbo", "resolve_base_url"]
