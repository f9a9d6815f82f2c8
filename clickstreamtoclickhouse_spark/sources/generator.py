"""Custom Python DataSource (Spark 4 extension point): deterministic
clickstream event generator.

`spark.read.format("eventgen")` produces Segment-Spec-shaped event
rows without any input files — the load-generator source every
pipeline needs for scale rehearsal (soak-testing a 1000-executor job
without staging 100 TB of input). Spark 4's Python DataSource API
makes the source a first-class scan: it reports `partitions()`, so
generation is EXECUTOR-parallel (one seeded counter range per
partition, no driver materialization, no shuffle), and the scan
composes with every downstream operator like any file scan.

Determinism: row i (globally numbered across partitions) is a pure
function of (seed, i) via the same md5-based arithmetic the engine
uses elsewhere (dataset_split, weighted sampling) — reruns and
retried tasks produce identical data, which rand()-based generators
violate (a retried task would emit different rows).

No reference counterpart (SURVEY §2.1 extension tier).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE"
)

_EVENT_TYPES = ("view", "click", "purchase", "error", "signup")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _u(seed: int, i: int, tag: str) -> int:
    """Deterministic 63-bit uniform from (seed, i, tag)."""
    h = hashlib.md5(f"{seed}:{i}:{tag}".encode()).digest()
    return int.from_bytes(h[:8], "big") >> 1


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EventGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_users = int(options.get("users", 100))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _Range(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _Range):
        naive_epoch = _EPOCH.replace(tzinfo=None)
        for i in range(partition.start, partition.end):
            ts = naive_epoch + timedelta(seconds=_u(self.seed, i, "t") % (30 * 86400))
            yield (
                i,
                ts,
                _u(self.seed, i, "u") % self.n_users,
                _EVENT_TYPES[_u(self.seed, i, "e") % len(_EVENT_TYPES)],
                (_u(self.seed, i, "v") % 100_000) / 100.0,
            )


class EventGenStreamReader(SimpleDataSourceStreamReader):
    """Unbounded variant: offsets are plain row counters, so every
    micro-batch is the deterministic row range [start, start+batch) —
    replaying a batch (failure recovery reads readBetweenOffsets)
    regenerates byte-identical rows, which is exactly the replayable-
    source contract Structured Streaming's exactly-once model
    assumes."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("rowsPerBatch", 100))
        self.n_users = int(options.get("users", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _gen(self, start: int, end: int):
        r = EventGenReader(
            {"rows": end, "partitions": 1, "users": self.n_users, "seed": self.seed}
        )
        # materialized list, not a generator: the simple-reader wrapper
        # pickles the batch for prefetch/replay, and generators don't
        # pickle
        return list(r.read(_Range(start, end)))

    def read(self, start: dict):
        s = int(start["next"])
        return self._gen(s, s + self.batch_rows), {"next": s + self.batch_rows}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._gen(int(start["next"]), int(end["next"]))


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> EventGenReader:
        return EventGenReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session:
    `spark.read.format("eventgen").option("rows", N).load()`."""
    spark.dataSource.register(EventGenDataSource)
