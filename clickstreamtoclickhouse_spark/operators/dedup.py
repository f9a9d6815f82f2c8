"""Table-engine read semantics Q1/Q2 (SURVEY.md §2.9) — the query
contract the reference delegates to ClickHouse table engines.

- Q1: ReplacingMergeTree() ORDER BY (timestamp, message_id)
  (clickhouse.py:81-88): duplicate sort-key rows eventually collapse.
  Read-view equivalent: keep one row per (timestamp, message_id).
- Q2: ReplacingMergeTree(ver) ORDER BY (user_id)
  (clickhouse.py:112-118, ver from send_to_warehouse.py:165): latest
  row per user_id by ver wins.

Both are single-shuffle window/dropDuplicates plans; at scale the
shuffle key is high-cardinality (message_id / user_id) so partitions
balance. For at-rest dedup (compaction) apply the same view and
rewrite the partition — semantics stay identical between read-time
and compact-time because they share these definitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_by_sort_key(df: DataFrame, keys: tuple[str, ...] = ("timestamp", "message_id")) -> DataFrame:
    """Q1 read view. dropDuplicates keeps an arbitrary row per key —
    exactly ClickHouse's unversioned ReplacingMergeTree contract ("any
    one of the duplicates survives")."""
    return df.dropDuplicates(list(keys))


def latest_version_view(
    df: DataFrame,
    key: str = "user_id",
    version: str = "ver",
    tiebreaks: tuple[str, ...] = ("message_id",),
) -> DataFrame:
    """Q2 read view: row_number over (key ORDER BY ver DESC) = 1.

    ClickHouse keeps the LAST-inserted row among equal (key, ver);
    insertion order isn't meaningful in a distributed write, so we pin
    determinism with explicit tiebreak columns instead (documented
    deviation — reference behavior is nondeterministic under merges
    anyway)."""
    order = [F.desc(version)] + [F.desc(t) for t in tiebreaks if t in df.columns]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.filter(F.col(key).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
