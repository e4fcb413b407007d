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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
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


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("closed", BooleanType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _update_sessions(gap_ms: int):
    """Build the per-key session fold. A closure so the gap rides into
    the worker inside the function object (no module import needed)."""
    import pandas as _pd

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = []
        if state.hasTimedOut:
            # watermark passed start of the silence gap: emit + drop
            start, last, n = state.get
            rows.append((key[0], start, last, n, True))
            state.remove()
            yield _pd.DataFrame(
                rows,
                columns=[
                    "user_id", "session_start_ms", "session_end_ms",
                    "n_events", "closed",
                ],
            )
            return
        ts = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["ts_ms"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0] - 1, 0
        for t in ts:
            if t - last > gap_ms and n > 0:
                rows.append((key[0], start, last, n, True))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        # keep the open session alive until the watermark clears the gap
        state.setTimeoutTimestamp(last + gap_ms)
        rows.append((key[0], start, last, n, False))
        yield _pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_start_ms", "session_end_ms",
                "n_events", "closed",
            ],
        )

    return update


def user_sessions_stateful(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Custom stateful sessionizer: gap-based sessions folded across
    micro-batches with event-time timeout.

    Why not ``F.session_window``? The built-in emits only closed,
    fully-aggregated windows in append mode. This operator ALSO emits the
    open session per key each batch (``closed = false``) — the "live
    session so far" view a dashboard needs — then a final ``closed =
    true`` row when the watermark passes ``last_event + gap`` (the
    ``hasTimedOut`` branch). No built-in mode expresses that.

    Scale: state is one (start, last, n) triple per ACTIVE user —
    dormant keys are evicted by the timeout, so state size tracks
    concurrent activity, not corpus cardinality. Each batch shuffles
    only its own rows to the key's state partition.

    Watermark contract: callers must ``withWatermark("ts", ...)`` before
    this operator — ``EventTimeTimeout`` requires it; timestamps are
    folded as epoch millis to keep state fixed-width.
    """
    gap_ms = _parse_gap_ms(gap)
    prepared = events.select(
        "user_id",
        "ts",
        (F.unix_millis(F.col("ts"))).alias("ts_ms"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_sessions(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _parse_gap_ms(gap: str) -> int:
    qty, unit = gap.split()
    mult = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(qty) * mult
