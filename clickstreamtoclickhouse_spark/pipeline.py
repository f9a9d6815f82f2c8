"""End-to-end ingest pipeline: the Spark-native equivalent of the
reference's SendToWarehouseJob (seghouse/jobs/send_to_warehouse.py:93-139).

Flow (reference cites per stage):
  read NDJSON/parquet dir          :104-131, :322-355   -> sources.readers
  flatten + decamelize + clean     :338-347, json_util   -> sources.flatten
  drop skip_fields                 :123-124              -> operators.project
  split into 6 event types         :357-368              -> operators.project
  parse timestamps                 :44-46                -> operators.normalize
  normalize event names            :48-51                -> operators.normalize
  extra timezone timestamps        :63-78                -> operators.normalize
  unix millis                      :80                   -> operators.normalize
  users derivation (ver)           :161-189              -> operators.normalize/dedup
  per-event table fan-out          :214-232              -> here
  tracks column projection         :193-197              -> operators.project

Deviation log (SURVEY.md §3.3): groups/aliases are routed to their own
tables (the reference inserts them into `identities` —
send_to_warehouse.py:280,296 — a bug we deliberately fix);
unix_timestamp_in_millis is a true Int64.

Scale design: ONE distributed read; the flattened batch is cached
before the 6-way type split (each split is a predicate over the cached
scan, not a re-read); all transforms are Column expressions; the only
driver-side collect is the distinct track-event-name list (mirrors
A1, send_to_warehouse.py:215 — bounded by the number of distinct
event NAMES, not rows).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .naming import decamelize
from .operators import normalize, project
from .sources import readers
from .tables import (
    DEFAULT_TABLES,
    EVENT_TYPE_TO_TABLE,
    TRACKS_COLUMN_PREFIXES,
    TRACKS_STRUCTURE,
)


@dataclass
class IngestResult:
    """All destination tables for one ingested batch."""

    tables: dict[str, DataFrame]
    event_tables: dict[str, DataFrame] = field(default_factory=dict)
    corrupt: DataFrame | None = None
    cached: list[DataFrame] = field(default_factory=list)

    def all_tables(self) -> dict[str, DataFrame]:
        return {**self.tables, **self.event_tables}

    def unpersist(self) -> None:
        """Release the batch's cached scans. Call after the sink has
        consumed every table — in the streaming foreachBatch path each
        micro-batch would otherwise leak a cached DataFrame and churn
        executor storage memory on long-running streams."""
        for df in self.cached:
            df.unpersist()
        self.cached = []


class EventPipeline:
    """Configurable ingest pipeline (config fields mirror AppConf,
    seghouse/config/configuration.py:22-29)."""

    def __init__(
        self,
        spark: SparkSession,
        namespace: str = "events",
        skip_fields: tuple[str, ...] = (),
        extra_timestamps: dict[str, str] | None = None,
        max_array_elements: int | None = None,
        per_event_tables: bool = True,
        max_event_tables: int = 1000,
    ) -> None:
        self.spark = spark
        # namespace decamelized like the reference (send_to_warehouse.py:97)
        self.namespace = decamelize(namespace)
        self.skip_fields = skip_fields
        self.extra_timestamps = extra_timestamps or {}
        self.max_array_elements = max_array_elements
        self.per_event_tables = per_event_tables
        self.max_event_tables = max_event_tables

    # -- entry points --------------------------------------------------

    def ingest_json_dir(self, path: str) -> IngestResult:
        raw = readers.read_ndjson(
            self.spark, path, max_array_elements=self.max_array_elements
        )
        result = self._process(raw.events, corrupt=raw.corrupt)
        if raw.cached is not None:
            result.cached.append(raw.cached)
        return result

    def ingest_parquet(self, path: str) -> IngestResult:
        return self._process(readers.read_parquet_events(self.spark, path))

    def ingest_df(self, df: DataFrame) -> IngestResult:
        return self._process(df)

    # -- pipeline ------------------------------------------------------

    def _process(self, df: DataFrame, corrupt: DataFrame | None = None) -> IngestResult:
        df = project.drop_skip_fields(df, self.skip_fields)
        df = normalize.parse_timestamps(df)
        df = normalize.add_unix_millis(df)
        df = normalize.add_extra_timestamps(df, self.extra_timestamps)
        df = df.cache()  # one scan feeds the 6-way split

        by_type = project.split_by_type(df)
        tables: dict[str, DataFrame] = {}

        tracks_all = normalize.normalize_event_names(by_type["track"])
        # common tracks table keeps base + configured prefixes only
        # (properties_* excluded; send_to_warehouse.py:193-197)
        tables["tracks"] = project.select_columns(
            tracks_all,
            keep=tuple(TRACKS_STRUCTURE),
            prefixes=TRACKS_COLUMN_PREFIXES,
        )

        tables["identities"] = by_type["identify"]
        tables["pages"] = by_type["page"]
        tables["screens"] = by_type["screen"]
        tables["groups"] = by_type["group"]
        tables["aliases"] = by_type["alias"]

        # users = identities + ver (int64 ns), user_id non-null
        # (send_to_warehouse.py:161-189); latest-per-user is a READ
        # view (operators.dedup.latest_version_view), not applied at
        # ingest — parity with ReplacingMergeTree eventual semantics.
        users = normalize.add_users_ver(tables["identities"])
        if "user_id" in users.columns:
            users = users.filter(users["user_id"].isNotNull())
        tables["users"] = users

        event_tables: dict[str, DataFrame] = {}
        if self.per_event_tables and "event" in tracks_all.columns:
            # A1: the only distinct+sort in the reference
            # (send_to_warehouse.py:215). Driver-side list of event
            # NAMES (small); each per-event table is a filter over the
            # cached batch. The write path partitions by event instead
            # when sinking to one lakehouse table (sinks.parquet_sink).
            # Cardinality guard: the collect is bounded by
            # max_event_tables + 1, so a pathological high-cardinality
            # `event` column (ids leaking into names) can neither OOM
            # the driver nor fan out unbounded tables — overflow names
            # stay in the common `tracks` table and we warn.
            cap = self.max_event_tables
            # NULL names are excluded *before* the limit probe so a
            # NULL can't consume one of the cap+1 slots and mask the
            # overflow warning (rows with NULL event stay in `tracks`).
            rows = (
                tracks_all.select("event")
                .filter(F.col("event").isNotNull())
                .distinct()
                .orderBy("event")
                .limit(cap + 1)
                .collect()
            )
            names = [r[0] for r in rows]
            if len(names) > cap:
                import warnings

                warnings.warn(
                    f"more than {cap} distinct event names; creating "
                    f"per-event tables for the first {cap} only (rest "
                    "remain queryable in `tracks`)",
                    stacklevel=2,
                )
                names = names[:cap]
            for name in names:
                # name-collision escape prefix (send_to_warehouse.py:219-223)
                table = f"esc_{name}" if name in DEFAULT_TABLES else name
                event_tables[table] = project.filter_event(tracks_all, name)

        return IngestResult(
            tables=tables, event_tables=event_tables, corrupt=corrupt, cached=[df]
        )


__all__ = ["EventPipeline", "IngestResult", "EVENT_TYPE_TO_TABLE"]
