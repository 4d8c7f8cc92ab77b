"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: per-user running statistics (event count, value sum,
last-seen timestamp) maintained as explicit state across micro-batches
— the pattern for operators the built-in windowed aggregations cannot
express (custom eviction, model state, complex session logic).

State is keyed by user_id, so it shuffles once per micro-batch on the
grouping key and scales with distinct users, not stream length.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

try:
    # Ship the stateful-update function by value so workers never need
    # this package on their own sys.path (see operators/multimodal.py).
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older cloudpickle
    pass

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double, last_ts timestamp"
STATE_SCHEMA = "n long, s double, last long"


def _update_user_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [s],
            "last_ts": [pd.Timestamp(last)],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running stats (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
