"""Core analytical query layer: aggregations, joins, windows, set ops.

The reference delegates ALL ad-hoc analytics to ClickHouse after load
(SURVEY.md §2.5-2.7 — no joins/aggs/windows exist in its code). This
module is the Spark-native query layer over the same data: declarative
DataFrame plans so Catalyst does pushdown/pruning/join-selection, with
explicit broadcasts for dimension tables (they stay small at any SF;
fact tables scale).

Scale notes (100 TB stance):
- joins put the big fact table (lineitem/orders/events) on the streamed
  side; dimensions (region/nation/supplier) are broadcast — no shuffle
  of the fact table for those edges. customer at SF-100k is too big to
  broadcast; AQE decides (sort-merge w/ shuffle on the key).
- every aggregation is a partial (map-side) + final hash agg — Spark
  default; group keys here are low-cardinality, so no skew salt needed.
- window functions partition by high-cardinality keys (user_id,
  c_custkey) — shuffles once, no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..util import widen_scan
from .registry import load, query

# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5 query layer)
# ---------------------------------------------------------------------------


@query(
    "daily_events",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: daily event counts + exact distinct users by type.

    scan -> project(3 cols, pruned at parquet) -> partial agg ->
    shuffle on (date, type) -> final agg. count(DISTINCT) triggers
    expand+two-phase agg; cardinality (days x types) is tiny so the
    shuffle is negligible at any scale.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 2) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter pushed to parquet, 8 aggregates
    over 2 low-cardinality keys — pure map-side-combine territory."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )


@query(
    "mktsegment_stats",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(avg(c_acctbal), 2) AS avg_acctbal,
           round(min(c_acctbal), 2) AS min_acctbal,
           round(max(c_acctbal), 2) AS max_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def mktsegment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.6 query layer)
# ---------------------------------------------------------------------------


@query(
    "top_customers",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join + top-k. Aggregate orders FIRST on o_custkey (one
    shuffle of pre-aggregated rows), then join the small aggregate to
    customer — at 100 TB this avoids shuffling raw orders into the
    join. Deterministic tiebreak on c_custkey for the LIMIT."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@query(
    "region_revenue",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. supplier/nation/region are broadcast (constant
    size at any SF); lineitem⋈orders is the one real shuffle, on the
    order key; the date filter is pushed into the orders parquet scan
    so the shuffle only carries qualifying orders."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (set-difference semantics, SURVEY §2.6): customers
    with no urgent orders. Spark plans a left-anti join; the filter on
    orders is pushed into its parquet scan so only urgent order keys
    shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.7 — the ReplacingMergeTree read semantics family)
# ---------------------------------------------------------------------------


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS latest_ts,
           event_type AS latest_event_type,
           round(value, 2) AS latest_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 semantics (ReplacingMergeTree(ver) ORDER BY user_id,
    /root/reference/seghouse/warehouse/clickhouse.py:112-118): latest
    row per key by version — row_number over (user_id, ts DESC) with a
    deterministic event_id tiebreak. One shuffle on user_id."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("latest_ts"),
            F.col("event_type").alias("latest_event_type"),
            F.round("value", 2).alias("latest_value"),
        )
    )


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap>30min cumulative flag (SURVEY
    §2.11 time-series row). Single shuffle on user_id serves both the
    window and the final per-user aggregate (same partitioning reused
    across stages — no second exchange)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"), F.count("*").alias("n_events"))
    )


@query(
    "user_running_value",
    oracle="""
    SELECT event_id,
           user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    WHERE user_id < 5
    """,
)
def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user (cumulative window frame)."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


# ---------------------------------------------------------------------------
# Semi-structured: props JSON (the reference's properties_* analog)
# ---------------------------------------------------------------------------


@query(
    "props_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(json_extract_string(props, '$.k')) AS n_with_k
    FROM events
    GROUP BY event_type
    """,
)
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the un-flattened props column — the
    query-time analog of the reference's flatten (it materializes
    properties_* columns at ingest; we can also extract lazily).

    Uses from_json with an explicit schema: ONE parse per row, fully
    codegen'd. (get_json_object proved pathological here — its shared
    path-cache serializes 32 executor threads; measured 30-150s vs
    0.5s for from_json on the same data.)"""
    e = widen_scan(load(spark, sf_dir, "events"))
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        e.withColumn("j", F.from_json("props", schema))
        .groupBy("event_type")
        .agg(F.sum("j.k").alias("sum_k"), F.count("j.k").alias("n_with_k"))
    )


@query(
    "props_variant_extract",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT)
             AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed
    variant_get path access — the schema-on-read path for ragged JSON
    where from_json's fixed schema (props_extract) doesn't fit.
    VARIANT keeps the parsed tree in a compact binary form, so
    repeated path accesses don't re-parse the string (the reason it
    replaces get_json_object-style per-path parsing at scale)."""
    e = load(spark, sf_dir, "events")
    v = e.select(F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"))
    return (
        v.filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).cast("bigint").alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )
