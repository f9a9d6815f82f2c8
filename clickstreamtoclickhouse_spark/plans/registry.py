"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 gets a `@query` entry;
the driver's correctness gate runs the Spark callable and the oracle
side-by-side (order-insensitive value-hash), so:

- every computed column is aliased IDENTICALLY in both;
- timestamps/dates are emitted as formatted strings (Spark session TZ
  pinned to UTC; DuckDB naive) so the value hashes agree;
- float aggregates are rounded in both to dodge summation-order ULP
  drift between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; `oracle` is DuckDB-runnable ANSI SQL over the
    pre-registered testdata views, or None for non-SQL-expressible ops
    (driver then records a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


_NANO_TS_COLS: dict[str, list[str]] = {}
_warned_tz: list[str] = []  # one-time non-UTC session warning latch


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (footer-only check,
    cached per path). Spark has no nanosecond timestamp type; we read
    them as long (legacy.parquet.nanosAsLong) and truncate to micros —
    matching DuckDB, whose TIMESTAMP is microseconds."""
    if path not in _NANO_TS_COLS:
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            _NANO_TS_COLS[path] = [
                f.name for f in schema if str(f.type) == "timestamp[ns]"
            ]
        except (ImportError, FileNotFoundError, OSError):
            # pyarrow absent or path unreadable: fall through with no
            # nano columns — the spark.read below raises the real,
            # actionable error for a missing/corrupt path. Other
            # exceptions (bugs) propagate.
            _NANO_TS_COLS[path] = []
    return _NANO_TS_COLS[path]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan; Catalyst pushes
    filters/projections from downstream operators into this scan)."""
    path = f"{sf_dir}/{table}.parquet"
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        # Session-wide invariant (see session.get_spark, which sets it
        # at construction): nanosAsLong is ALWAYS true in this engine —
        # nano-ts columns read as long and are truncated to micros
        # below. For foreign sessions (the driver owns its own) we
        # establish the invariant once, idempotently; it is never unset,
        # so concurrent plans observe one consistent behavior.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # integer `div` keeps full precision (double division would lose
        # bits at 1e18-scale nanos); truncation matches DuckDB's cast.
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Parquet timestamp[us] WITHOUT timezone infers as TIMESTAMP_NTZ on
    # sessions with spark.sql.parquet.inferTimestampNTZ.enabled (the
    # Spark 3.4+ default, and the driver owns its own session so we
    # can't rely on our factory's override). Chrono functions like
    # unix_micros() reject NTZ, so convert to TIMESTAMP — TZ-explicitly:
    # the naive wall clock is UTC. cast(NTZ→TIMESTAMP) interprets the
    # wall clock in the SESSION TZ (instant = w - tzOffset);
    # from_utc_timestamp(t, tz) applies the exact inverse shift
    # (t + tzOffset), so the composition yields instant == w-as-UTC
    # (verified vs DuckDB under America/New_York; wall clocks inside a
    # DST spring-forward gap of a non-UTC session TZ resolve per JVM
    # gap rules and can land an hour off — nonexistent under UTC).
    #
    # ENGINE INVARIANT — UTC session for full oracle parity: this
    # conversion makes EPOCH semantics (unix_micros, time windows,
    # interval joins) TZ-independent, but Spark renders wall clocks
    # (date_format / date_trunc / datediff) in the session TZ by
    # definition, so those outputs additionally assume a UTC session —
    # which the driver and our factory both guarantee. A non-UTC
    # session gets a loud one-time warning instead of silently
    # TZ-shifted rendered columns.
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if ntz:
        session_tz = spark.conf.get("spark.sql.session.timeZone")
        if session_tz not in ("UTC", "Etc/UTC", "GMT", "Z") and not _warned_tz:
            import sys

            print(
                f"[registry] WARNING: session timeZone={session_tz!r}; epoch "
                "semantics stay UTC-correct but wall-clock-rendered columns "
                "(date_format/date_trunc/datediff) follow the session TZ — "
                "set spark.sql.session.timeZone=UTC for full oracle parity",
                file=sys.stderr,
            )
            _warned_tz.append(session_tz)
        for c in ntz:
            df = df.withColumn(
                c, F.from_utc_timestamp(F.col(c).cast("timestamp"), session_tz)
            )
    return df
