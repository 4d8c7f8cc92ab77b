from .queries import ORACLES, QUERIES, query_fn

__all__ = ["ORACLES", "QUERIES", "query_fn"]
