"""Projections / filters P1-P6 (SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import EVENT_TYPES


def split_by_type(df: DataFrame) -> dict[str, DataFrame]:
    """P1: six equality filters over one parent scan
    (send_to_warehouse.py:357-368). Caller should .cache() the parent
    before fan-out so the source is scanned once."""
    if "type" not in df.columns:
        return {t: df.limit(0) for t in EVENT_TYPES}
    return {t: df.filter(F.col("type") == t) for t in EVENT_TYPES}


def filter_event(df: DataFrame, event: str) -> DataFrame:
    """P2: per-event-name filter inside the tracks fan-out
    (send_to_warehouse.py:217)."""
    return df.filter(F.col("event") == F.lit(event))


def drop_skip_fields(df: DataFrame, skip_fields: tuple[str, ...]) -> DataFrame:
    """P3: drop configured skip columns, ignoring missing ones
    (send_to_warehouse.py:123-124)."""
    return df.drop(*[c for c in skip_fields if c in df.columns])


def select_columns(df: DataFrame, keep: tuple[str, ...], prefixes: tuple[str, ...]) -> DataFrame:
    """P4: keep columns in the keep-list or starting with any prefix
    (send_to_warehouse.py:309-320; prefixes
    default_table_structure.py:23-28)."""
    cols = [c for c in df.columns if c in keep or c.startswith(tuple(prefixes))]
    return df.select(*cols)


def columns_with_data(df: DataFrame) -> list[str]:
    """P5: columns that have at least one non-null value in the batch
    (dataframe_util.py:43-51 drives inference to skip all-null
    columns). ONE aggregate pass for all columns (map-side combined),
    not a per-column scan."""
    if not df.columns:
        return []
    row = df.agg(
        *[F.max(F.col(f"`{c}`").isNotNull().cast("int")).alias(c) for c in df.columns]
    ).first()
    return [c for c in df.columns if row[c] == 1]


def add_missing_columns(df: DataFrame, expected: dict[str, T.DataType]) -> DataFrame:
    """P6: ensure every sink column exists, null-typed when absent
    (dataframe_util.py:92-96, called from clickhouse.py:201)."""
    missing = {c: t for c, t in expected.items() if c not in df.columns}
    if not missing:
        return df
    return df.withColumns({c: F.lit(None).cast(t) for c, t in missing.items()})
