from .queries import ORACLES, QUERIES, query_fn
from . import etl_queries  # noqa: F401  (registers ETL operator queries)
from . import scd_queries  # noqa: F401  (registers SCD operator queries)
from . import pipeline_queries  # noqa: F401  (registers LLM-pipeline queries)
from . import analytics_queries  # noqa: F401  (registers analytics queries)
from . import streaming_queries  # noqa: F401  (registers streaming queries)
from . import coverage_queries  # noqa: F401  (registers W7/A3/pivot coverage)
from . import extension_queries  # noqa: F401  (registers r2 extension ops)
from . import advanced_queries  # noqa: F401  (registers r3 advanced ops)
from . import warehouse_queries  # noqa: F401  (registers r4 physical-design ops)
from . import selection_queries  # noqa: F401  (registers r5 data-selection ops)
from . import behavior_queries  # noqa: F401  (registers r5 behavioral ops)
from . import graph_queries  # noqa: F401  (registers r5 graph ops)
from . import physical_queries  # noqa: F401  (registers r5 physical/sketch ops)
from . import corpus_queries  # noqa: F401  (registers r5 tokenizer-prep ops)

__all__ = ["ORACLES", "QUERIES", "query_fn"]
