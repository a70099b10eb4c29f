"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the engine's answer to 'an operator Structured Streaming lacks' (SURVEY
§2.11 extension; tier (b) of the custom-operator policy).

``spend_alerts``: per-user cumulative spend tracker that emits one row
each time a user's running total crosses another multiple of
``threshold``. Not expressible as a windowed aggregate (the emission
condition depends on unbounded running state), so it carries explicit
GroupState: {total: double, alerts: long}.

State is per-key and bounded (2 numbers per user); at scale the shuffle
partitions by user_id exactly like any keyed agg, and state lives in the
state store with checkpointing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("alert_no", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("alerts", T.LongType()),
    ]
)


def spend_alerts(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """events(user_id, value, ...) stream → alert rows on each crossing of
    ``threshold`` multiples of cumulative value per user."""

    def track(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, alerts = state.get if state.exists else (0.0, 0)
        out = []
        for pdf in pdfs:
            # deterministic within-batch order
            for v in pdf.sort_values(["ts", "event_id"])["value"]:
                total += float(v)
                while total >= (alerts + 1) * threshold:
                    alerts += 1
                    out.append((user_id, alerts, total))
        state.update((total, alerts))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "alert_no", "total_value"])

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=ALERT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
