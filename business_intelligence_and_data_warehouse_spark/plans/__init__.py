from .queries import ORACLES, QUERIES, query_fn
from . import etl_queries  # noqa: F401  (registers ETL operator queries)

__all__ = ["ORACLES", "QUERIES", "query_fn"]
