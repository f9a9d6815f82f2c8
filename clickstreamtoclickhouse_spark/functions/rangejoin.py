"""Bucketed range join: scale-safe point-in-interval joins.

Spark has no native range-join optimization: a join whose condition
is only `i.start <= p.ts AND p.ts < i.end` (plus optional equality
keys) is planned as BroadcastNestedLoopJoin or CartesianProduct —
O(|points| x |intervals|) comparisons, a scale-killer the moment
either side stops fitting in a broadcast.

This module implements the standard fix (the same strategy behind
Databricks' range-join hint and KDB/TimescaleDB interval indexes,
all public designs): quantize time into fixed buckets, explode each
interval into the buckets it overlaps, map each point to its single
bucket, equi-join on (keys..., bucket), and apply the exact
predicate after the join. The join becomes hash-partitioned and
shuffles both sides once; the only overhead is the interval-side
blowup of ceil(len/bucket)+1 rows, so pick `bucket_seconds` near
the typical interval length.

No reference-repo counterpart (the reference delegates all joins to
ClickHouse); SURVEY.md §2.6 extension tier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start: str,
    end: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join `points` to every interval containing them.

    Containment is HALF-OPEN: start <= point_ts < end. `keys` are
    equality columns that must exist under the same name in both
    frames; other column names must not collide (select/alias
    upstream). Empty or inverted intervals (end <= start) match
    nothing and are dropped before the explode — Spark's `sequence`
    would otherwise count BACKWARD (step defaults to -1 when start >
    stop) and fabricate wrong buckets.

    A point matches an interval exactly once: the point lives in one
    bucket, and the exploded interval has one row per bucket.
    """
    bus = int(bucket_seconds) * 1_000_000  # micros per bucket
    p = points
    for k in keys:
        p = p.withColumnRenamed(k, f"_p_{k}")
    p = p.withColumn(
        "_p_bucket", F.floor(F.unix_micros(F.col(point_ts)) / F.lit(bus))
    )
    i = intervals.filter(F.col(end) > F.col(start)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start)) / F.lit(bus)),
                # end is exclusive: the last covered instant is end-1us
                F.floor((F.unix_micros(F.col(end)) - 1) / F.lit(bus)),
            )
        ),
    )
    cond = F.col("_p_bucket") == F.col("_bucket")
    for k in keys:
        cond = cond & (F.col(f"_p_{k}") == F.col(k))
    out = i.join(p, cond).filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return out.drop("_bucket", "_p_bucket", *[f"_p_{k}" for k in keys])
