"""Stateful streaming operators (SURVEY.md §2.8 capability additions —
the reference has no streaming; its idempotency contract is
at-least-once + eventual dedup, which `streaming_dedup` upgrades to
exactly-once-per-key within the watermark).

All operators take an unbounded (readStream) DataFrame and return a
transformed streaming DataFrame; state is bounded by watermarks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("message_id",),
    ts_col: str = "timestamp",
    watermark: str = "1 hour",
) -> DataFrame:
    """In-stream Q1 semantics: drop duplicate keys as they arrive,
    with state bounded by the watermark (duplicates farther apart than
    the watermark fall back to the at-rest dedup view — same contract
    as ClickHouse's eventual ReplacingMergeTree merges)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def session_aggregation(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "timestamp",
    key_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native session windows: per-user sessions closed after `gap` of
    inactivity — the streaming analog of the batch sessionization
    query (plans/core.py:sessionization)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("session"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


_COUNTER_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("batch_events", T.LongType()),
    ]
)
_COUNTER_STATE = T.StructType([T.StructField("total", T.LongType())])


def running_user_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "timestamp",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a
    per-user lifetime event counter that survives across micro-batches
    (GroupState). Demonstrates the arbitrary-stateful escape hatch for
    operators session_window/agg can't express."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        batch = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events_total": [total], "batch_events": [batch]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=_COUNTER_OUT,
            stateStructType=_COUNTER_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
