"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's only cross-batch state is its DynamoDB batch ledger
(arrival flags + exactly-once trigger, ``Lambda/lambda_function.py:99-265``)
— state lives *outside* the engine. Spark's arbitrary-stateful-processing
API brings that state inside the stream: per-key state rows survive
across micro-batches in the state store (checkpointed, fault-tolerant),
and the update function sees Arrow-batched pandas frames per key.

Scale design: state is partitioned by the grouping key across executors;
each micro-batch shuffles only that batch's rows to their key's
partition (state itself never moves). Keys with no new rows cost
nothing. State size is O(distinct keys × state row width) — for the
running-totals operator below, two numbers per user.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the persisted
    (n_events, total_value) state and emit the new running totals."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) maintained across
    micro-batches — a custom stateful operator no built-in aggregation
    mode expresses (each batch must emit the *cumulative* row per user
    seen in that batch, in update mode).

    Input: streaming events with (user_id, value). Output: one row per
    (micro-batch, user-with-new-events).
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
