"""Transactional lakehouse sink (Delta Lake): MERGE-based upserts.

Beyond the reference's surface: the reference (and this repo's
``parquet_sink``) reproduces ClickHouse ReplacingMergeTree semantics
by appending duplicates and deduplicating at READ time (views) or in
a background rewrite (``compact()``). That contract holds at 100 TB
but makes every read pay the dedup window. The transactional
alternative is to resolve upserts at WRITE time with ACID MERGE,
which is what a Delta (or Iceberg — same mapping, different API)
sink provides:

| reference semantic (seghouse/warehouse/clickhouse.py) | Delta equivalent |
|---|---|
| ``ReplacingMergeTree()`` dedup by (timestamp, message_id) (:85-88) | ``MERGE ON t.timestamp = s.timestamp AND t.message_id = s.message_id WHEN NOT MATCHED THEN INSERT`` (insert-if-absent) |
| ``ReplacingMergeTree(ver)`` users latest-per-user (:112-118)       | ``MERGE ON t.user_id = s.user_id WHEN MATCHED AND s.ver > t.ver THEN UPDATE WHEN NOT MATCHED THEN INSERT`` |
| ``PARTITION BY toDate(timestamp)`` (:86)                           | ``partitionBy(event_date)`` at table creation |
| ``ALTER TABLE ADD COLUMN IF NOT EXISTS`` (:185-191)                | ``spark.databricks.delta.schema.autoMerge.enabled`` / explicit ``ALTER TABLE ADD COLUMNS`` |
| background merges collapsing duplicates                            | ``OPTIMIZE`` + vacuum (no correctness role — MERGE already resolved) |

Scale note: MERGE shuffles the batch against the matched files only
(Delta data-skips on the ON-clause partition/stat ranges), so the
per-batch cost is bounded by touched partitions, not table size —
the property that makes write-time upsert viable at 100 TB where a
read-time window over the full table is not.

The delta-spark package and its jars are NOT present in this
environment (no network; pip installs disallowed), so ``connect()``
raises with setup guidance. Every data-path method is real Delta API
code behind that gate — on a cluster with
``io.delta:delta-spark_2.13`` on the classpath and the two catalog
confs set, this class is live. Tests: the gate's failure mode is
pinned always; the live path is ``pytest.importorskip``-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .warehouse import Warehouse

_SETUP_HINT = (
    "DeltaWarehouse needs the delta-spark package and jars: install "
    "delta-spark, add io.delta:delta-spark_2.13:<version> to "
    "spark.jars.packages, and set "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension and "
    "spark.sql.catalog.spark_catalog="
    "org.apache.spark.sql.delta.catalog.DeltaCatalog"
)


def _delta_table_cls():
    try:
        from delta.tables import DeltaTable
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(_SETUP_HINT) from e
    return DeltaTable


class DeltaWarehouse(Warehouse):
    """Delta Lake sink: write-time MERGE upserts in place of the
    parquet sink's read-time dedup views."""

    def __init__(self, spark: SparkSession, schema_prefix: str = "") -> None:
        self.spark = spark
        self.schema_prefix = schema_prefix

    # -- connection (S14): probe = Delta classes resolvable ------------
    def connect(self) -> None:
        _delta_table_cls()
        self.spark.sql("SELECT 1").collect()

    def close(self) -> None:
        pass

    def _name(self, schema: str, table: str) -> str:
        return f"`{self.schema_prefix}{schema}`.`{table}`"

    # -- DDL surface ---------------------------------------------------
    def create_schema(self, schema: str) -> None:
        _delta_table_cls()
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{self.schema_prefix}{schema}`")

    def create_table(self, schema, table, column_types, non_null_columns=()) -> None:
        _delta_table_cls()
        cols = ", ".join(
            f"`{n}` {t.simpleString()}"
            + (" NOT NULL" if n in non_null_columns else "")
            for n, t in column_types.items()
        )
        partition = (
            "PARTITIONED BY (event_date DATE) "
            if "timestamp" in column_types
            else ""
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._name(schema, table)} "
            f"({cols}{', event_date DATE' if partition else ''}) "
            f"USING DELTA {partition}"
        )

    def describe_table(self, schema: str, table: str) -> dict[str, T.DataType]:
        _delta_table_cls()
        df = self.spark.table(self._name(schema, table))
        return {
            f.name: f.dataType for f in df.schema.fields if f.name != "event_date"
        }

    def add_column(self, schema, table, column, column_type) -> None:
        _delta_table_cls()
        self.spark.sql(
            f"ALTER TABLE {self._name(schema, table)} ADD COLUMNS "
            f"(`{column}` {column_type.simpleString()})"
        )

    # -- data path -----------------------------------------------------
    def insert_df(self, schema: str, table: str, df: DataFrame) -> None:
        """Write-time dedup: MERGE insert-if-absent on the sort key
        (the RMT() analog); plain append for keyless tables."""
        DeltaTable = _delta_table_cls()
        out = df
        if "timestamp" in out.columns:
            out = out.withColumn("event_date", F.to_date("timestamp"))
        if {"timestamp", "message_id"} <= set(df.columns):
            target = DeltaTable.forName(self.spark, self._name(schema, table))
            (
                target.alias("t")
                .merge(
                    out.alias("s"),
                    "t.timestamp = s.timestamp AND t.message_id = s.message_id",
                )
                .whenNotMatchedInsertAll()
                .execute()
            )
        else:
            out.write.format("delta").mode("append").saveAsTable(
                self._name(schema, table)
            )

    def upsert_users(self, schema: str, df: DataFrame) -> None:
        """RMT(ver) analog resolved at write: keep the max-ver row per
        user. The batch is pre-collapsed per user first so MERGE sees
        one source row per key (MERGE requires it)."""
        from pyspark.sql.window import Window

        DeltaTable = _delta_table_cls()
        w = Window.partitionBy("user_id").orderBy(F.desc("ver"), "message_id")
        latest = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        target = DeltaTable.forName(self.spark, self._name(schema, "users"))
        (
            target.alias("t")
            .merge(latest.alias("s"), "t.user_id = s.user_id")
            .whenMatchedUpdateAll(condition="s.ver > t.ver")
            .whenNotMatchedInsertAll()
            .execute()
        )
