"""Table-governance operators: column-statistics profiling, data-
quality assertions, histograms, and mergeable quantile sketches.

These are the ANALYZE / dbt-test / data-profiling surface a warehouse
team runs continuously over ingested tables — the reference delegates
all of this to ClickHouse's own introspection (`system.columns`,
`count() ... GROUP BY`); here each is a first-class Spark plan with a
DuckDB oracle twin (SURVEY.md §2.9/§2.11 extension tier).

Scale stance, per operator:

- ``table_profile``: ONE scan. The multiple exact count(DISTINCT)
  aggregates compile to a single Expand + two-phase aggregate (row
  multiplication x n_cols, but map-side partials keep the shuffle at
  distinct-value cardinality). At 100 TB swap the exact distincts for
  ``approx_count_distinct`` — same plan minus the Expand; the exact
  form is kept here because it is oracle-checkable.
- ``dq_assertions``: one scan per audited table (all per-table checks
  fused into one aggregate pass), plus one broadcast/shuffled anti-
  join per referential check. Violation counts, never violating rows,
  cross the wire.
- ``event_value_histogram``: scan -> project(bin) -> two-phase agg on
  a bounded key. Fixed-width integer binning (floor(x/w)) keeps the
  bin expression engine-portable (IEEE double division + floor).
- ``value_quantile_sketch``: the quantile analog of the HLL rollup —
  per-day fixed-bin histograms are the mergeable sketch (kilobytes
  per day regardless of row count); merging is a sum by bin, and any
  quantile is a cumulative walk over <=100 bins. The only window runs
  over the bounded bin table, never over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import widen_scan
from .registry import load, query

# ---------------------------------------------------------------------------
# table_profile — per-column statistics in one pass (ANALYZE analog)
# ---------------------------------------------------------------------------

# (column, kind) — kind picks the portable string rendering for min/max
_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("event_id", "int"),
    ("ts", "ts"),
    ("user_id", "int"),
    ("event_type", "str"),
    ("value", "double"),
    ("props", "str"),
)


def _fmt_minmax(c, kind: str):
    """Portable string rendering of a typed min/max: fixed-width for
    timestamps, printf %.6f for doubles (C-style in both engines),
    plain cast for ints/strings (ASCII data -> binary collation
    agrees)."""
    if kind == "ts":
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if kind == "double":
        return F.format_string("%.6f", c)
    return c.cast("string")


@query(
    "table_profile",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(event_id) AS c0, count(DISTINCT event_id) AS d0,
             CAST(min(event_id) AS VARCHAR) AS mn0,
             CAST(max(event_id) AS VARCHAR) AS mx0,
             count(ts) AS c1, count(DISTINCT ts) AS d1,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS mn1,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS mx1,
             count(user_id) AS c2, count(DISTINCT user_id) AS d2,
             CAST(min(user_id) AS VARCHAR) AS mn2,
             CAST(max(user_id) AS VARCHAR) AS mx2,
             count(event_type) AS c3, count(DISTINCT event_type) AS d3,
             min(event_type) AS mn3, max(event_type) AS mx3,
             count(value) AS c4, count(DISTINCT value) AS d4,
             printf('%.6f', min(value)) AS mn4,
             printf('%.6f', max(value)) AS mx4,
             count(props) AS c5, count(DISTINCT props) AS d5,
             min(props) AS mn5, max(props) AS mx5
      FROM events
    )
    SELECT 'event_id' AS column_name, n_rows, n_rows - c0 AS n_nulls,
           d0 AS n_distinct, mn0 AS min_value, mx0 AS max_value FROM s
    UNION ALL SELECT 'ts', n_rows, n_rows - c1, d1, mn1, mx1 FROM s
    UNION ALL SELECT 'user_id', n_rows, n_rows - c2, d2, mn2, mx2 FROM s
    UNION ALL SELECT 'event_type', n_rows, n_rows - c3, d3, mn3, mx3 FROM s
    UNION ALL SELECT 'value', n_rows, n_rows - c4, d4, mn4, mx4 FROM s
    UNION ALL SELECT 'props', n_rows, n_rows - c5, d5, mn5, mx5 FROM s
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profiler over `events` — row count, null
    count, exact distinct count, min/max per column — the ANALYZE /
    data-catalog refresh a warehouse runs after each load (the
    reference reads the same facts back from ClickHouse
    `system.columns` + DESCRIBE: seghouse/warehouse/clickhouse.py
    schema introspection).

    Plan: ONE scan; the six count(DISTINCT)s become a single Expand
    (x6 rows map-side) + two-phase aggregate, so the shuffle carries
    only distinct values per column. The 1-row aggregate then explodes
    to one row per column — driver-side width, not data width. At
    100 TB: same plan with approx_count_distinct dropping the Expand;
    exact distincts kept here because they are oracle-checkable."""
    e = widen_scan(load(spark, sf_dir, "events"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"c_{c}"),
            F.count_distinct(F.col(c)).alias(f"d_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    row = e.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"c_{c}")).alias("n_nulls"),
            F.col(f"d_{c}").alias("n_distinct"),
            _fmt_minmax(F.col(f"mn_{c}"), kind).alias("min_value"),
            _fmt_minmax(F.col(f"mx_{c}"), kind).alias("max_value"),
        )
        for c, kind in _PROFILE_COLS
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# dq_assertions — dbt-style data-quality checks as one report
# ---------------------------------------------------------------------------


@query(
    "dq_assertions",
    oracle="""
    WITH o AS (
      SELECT count(*) - count(DISTINCT o_orderkey) AS dup_orderkey,
             count(*) - count(o_custkey) AS null_custkey,
             CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_status
      FROM orders
    ),
    l AS (
      SELECT count(*) - count(l_orderkey) AS null_orderkey,
             CAST(coalesce(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_discount,
             CAST(coalesce(sum(CASE WHEN l_quantity <= 0.0
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_quantity
      FROM lineitem
    ),
    e AS (
      SELECT CAST(coalesce(sum(CASE WHEN value < 0.0 OR value > 400.0
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS out_of_envelope,
             count(*) - count(ts) AS null_ts,
             count(*) - count(DISTINCT event_id) AS dup_event_id
      FROM events
    ),
    fk_oc AS (
      -- NOT EXISTS, not NOT IN: anti-join semantics count a NULL key
      -- as an orphan (matches Spark left_anti); NOT IN would silently
      -- drop NULL-key rows from the violation count
      SELECT count(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ),
    fk_lo AS (
      SELECT count(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_orderkey = l.l_orderkey)
    ),
    checks AS (
      SELECT 'unique_o_orderkey' AS check_name, 'orders' AS table_name,
             dup_orderkey AS n_violations FROM o
      UNION ALL SELECT 'not_null_o_custkey', 'orders', null_custkey FROM o
      UNION ALL SELECT 'accepted_values_o_orderstatus', 'orders',
                       bad_status FROM o
      UNION ALL SELECT 'not_null_l_orderkey', 'lineitem',
                       null_orderkey FROM l
      UNION ALL SELECT 'range_l_discount', 'lineitem', bad_discount FROM l
      UNION ALL SELECT 'positive_l_quantity', 'lineitem', bad_quantity FROM l
      UNION ALL SELECT 'value_envelope_0_400', 'events',
                       out_of_envelope FROM e
      UNION ALL SELECT 'not_null_ts', 'events', null_ts FROM e
      UNION ALL SELECT 'unique_event_id', 'events', dup_event_id FROM e
      UNION ALL SELECT 'fk_orders_customer', 'orders', n FROM fk_oc
      UNION ALL SELECT 'fk_lineitem_orders', 'lineitem', n FROM fk_lo
    )
    SELECT check_name, table_name, n_violations,
           n_violations = 0 AS passed
    FROM checks
    """,
)
def dq_assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion suite (dbt-test analog): uniqueness,
    not-null, accepted-values, numeric-range, value-envelope, and two
    referential-integrity checks, reported as one row per check with
    its violation count. The reference enforces the same contracts
    implicitly (non-null sort keys, type coercion quarantine:
    SURVEY.md §2.9 Q5); here they are an executable report.

    Plan: all per-table checks fuse into ONE aggregate scan per table
    (orders / lineitem / events each scanned once, columns pruned);
    the FK checks are anti-join counts — `customer` broadcasts,
    lineitem⋈orders shuffles on the join key. Only counts reach the
    driver; violating ROWS never leave the executors, so the report
    is the same size at any SF."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")

    def _viol(cond) -> F.Column:
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("long")

    o = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
            "dup_orderkey"
        ),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
    )
    li = lineitem.agg(
        (F.count(F.lit(1)) - F.count("l_orderkey")).alias("null_orderkey"),
        _viol(
            (F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.1)
        ).alias("bad_discount"),
        _viol(F.col("l_quantity") <= 0.0).alias("bad_quantity"),
    )
    ev = events.agg(
        _viol((F.col("value") < 0.0) | (F.col("value") > 400.0)).alias(
            "out_of_envelope"
        ),
        (F.count(F.lit(1)) - F.count("ts")).alias("null_ts"),
        (F.count(F.lit(1)) - F.count_distinct("event_id")).alias(
            "dup_event_id"
        ),
    )
    fk_oc = (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fk_lo = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def rows(src: DataFrame, entries: list[tuple[str, str, str]]) -> DataFrame:
        structs = [
            F.struct(
                F.lit(name).alias("check_name"),
                F.lit(table).alias("table_name"),
                F.col(col).alias("n_violations"),
            )
            for name, table, col in entries
        ]
        return src.select(F.explode(F.array(*structs)).alias("c")).select(
            "c.*"
        )

    checks = (
        rows(o, [
            ("unique_o_orderkey", "orders", "dup_orderkey"),
            ("not_null_o_custkey", "orders", "null_custkey"),
            ("accepted_values_o_orderstatus", "orders", "bad_status"),
        ])
        .unionByName(rows(li, [
            ("not_null_l_orderkey", "lineitem", "null_orderkey"),
            ("range_l_discount", "lineitem", "bad_discount"),
            ("positive_l_quantity", "lineitem", "bad_quantity"),
        ]))
        .unionByName(rows(ev, [
            ("value_envelope_0_400", "events", "out_of_envelope"),
            ("not_null_ts", "events", "null_ts"),
            ("unique_event_id", "events", "dup_event_id"),
        ]))
        .unionByName(rows(fk_oc, [
            ("fk_orders_customer", "orders", "n"),
        ]))
        .unionByName(rows(fk_lo, [
            ("fk_lineitem_orders", "lineitem", "n"),
        ]))
    )
    return checks.withColumn("passed", F.col("n_violations") == 0)


# ---------------------------------------------------------------------------
# event_value_histogram — fixed-width equi-bin histogram
# ---------------------------------------------------------------------------

_HIST_W = 25.0  # bin width; value range ~[0, 500) -> ~20 bins


@query(
    "event_value_histogram",
    oracle=f"""
    SELECT CAST(floor(value / {_HIST_W}) AS BIGINT) AS bin,
           floor(value / {_HIST_W}) * {_HIST_W} AS bin_lo,
           (floor(value / {_HIST_W}) + 1) * {_HIST_W} AS bin_hi,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of `events.value` (bin width 25): the
    distribution profile behind range pruning, skew detection, and the
    quantile sketch below. Fixed-width `floor(x/w)` binning is chosen
    over data-dependent (min/max-scaled) edges so the bin function is
    a pure projection — no pre-pass, and IEEE double division + floor
    is bit-identical across engines.

    Plan: scan -> project(bin) -> two-phase agg on a BOUNDED key
    (range/width bins, independent of row count) — partials collapse
    map-side, the shuffle carries <=#bins rows per task."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bin_ = F.floor(F.col("value") / F.lit(_HIST_W))
    return (
        e.groupBy(
            bin_.cast("long").alias("bin"),
            (bin_ * _HIST_W).alias("bin_lo"),
            ((bin_ + 1) * _HIST_W).alias("bin_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# value_quantile_sketch — mergeable fixed-bin quantile summary
# ---------------------------------------------------------------------------

_QS_W = 5.0  # sketch bin width -> <=100 bins over [0, 500)
_QS_QUANTILES = (0.5, 0.9, 0.99)


@query(
    "value_quantile_sketch",
    oracle=f"""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             CAST(floor(value / {_QS_W}) AS BIGINT) AS bin,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    merged AS (
      SELECT bin, CAST(sum(c) AS BIGINT) AS cnt FROM daily GROUP BY bin
    ),
    cum AS (
      SELECT bin, cnt,
             CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS total
      FROM merged
    ),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS quantile)
    SELECT quantile,
           min((bin + 1) * {_QS_W}) AS est_value,
           max(total) AS n_total
    FROM qs JOIN cum ON cum >= quantile * total
    GROUP BY quantile
    """,
)
def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimation — the quantile analog of the HLL
    rollup (`sketch_rollup_users`): per-day fixed-bin histograms are
    the SKETCH (<=100 longs per day, regardless of row count); merging
    any set of days is a sum by bin; and p50/p90/p99 read off the
    merged cumulative walk with error bounded by the bin width. This
    is what lets a 100 TB pipeline keep day-level sketches and answer
    quantiles over ANY date range without rescanning rows.

    Plan: scan -> two-phase agg on (day, bin) [the sketch build] ->
    second agg on bin [the merge] -> ONE window over the <=100-row bin
    table (bounded by construction, never by data) -> tiny join
    against the 3 requested quantiles. DuckDB replays the identical
    schedule, so the estimates hash-match exactly."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
            F.floor(F.col("value") / F.lit(_QS_W)).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = daily.groupBy("bin").agg(F.sum("c").alias("cnt"))
    # bounded-table window: <=100 bins by construction (value envelope /
    # bin width), so the single-partition sort is O(bins), not O(rows)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QS_QUANTILES])).alias(
            "quantile"
        )
    )
    return (
        qs.join(cum, F.col("cum") >= F.col("quantile") * F.col("total"))
        .groupBy("quantile")
        .agg(
            F.min((F.col("bin") + 1) * _QS_W).alias("est_value"),
            F.max("total").alias("n_total"),
        )
    )


# ---------------------------------------------------------------------------
# value_drift_psi — population-stability drift between two periods
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16"  # period A: days 1-15; period B: days 16-30
_PSI_EPS = 1e-6  # Laplace floor so empty bins stay defined (standard PSI)


@query(
    "value_drift_psi",
    oracle=f"""
    WITH binned AS (
      SELECT CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'a' ELSE 'b' END
               AS period,
             f.feature,
             CASE f.feature
               WHEN 'event_type' THEN event_type
               ELSE CAST(CAST(floor(value / {_HIST_W}) AS BIGINT) AS VARCHAR)
             END AS bin
      FROM events
      CROSS JOIN (SELECT unnest(['event_type', 'value_bin']) AS feature) f
      WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT feature, bin,
             count(*) FILTER (period = 'a') AS ca,
             count(*) FILTER (period = 'b') AS cb
      FROM binned GROUP BY feature, bin
    ),
    totals AS (
      SELECT feature,
             CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM counts GROUP BY feature
    ),
    terms AS (
      SELECT c.feature,
             (ca * 1.0 / na + {_PSI_EPS}) AS p,
             (cb * 1.0 / nb + {_PSI_EPS}) AS q,
             na, nb
      FROM counts c JOIN totals t USING (feature)
    )
    SELECT feature,
           round(sum((p - q) * ln(p / q)), 6) AS psi,
           CAST(count(*) AS BIGINT) AS n_bins,
           max(na) AS n_period_a,
           max(nb) AS n_period_b
    FROM terms GROUP BY feature
    """,
)
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring via the Population Stability
    Index (standard model-monitoring metric): compare the first and
    second half of the event window per feature — `event_type`'s
    categorical distribution and `value`'s fixed-width histogram bins
    — with PSI = Σ (p−q)·ln(p/q) over Laplace-floored shares. The
    continuous counterpart to `dq_assertions`: rules catch broken
    rows, PSI catches a feed whose rows are individually valid but
    collectively shifted (upstream schema change, traffic mix flip).
    PSI < 0.1 = stable, 0.1–0.25 = drifting, > 0.25 = alarm.

    Plan: ONE scan; the 2-feature explode doubles rows map-side, then
    a two-phase aggregate on (feature, bin) — bounded keys (types x
    bins), so the shuffle is report-sized. The PSI reduce runs over
    the <=2x(bins) term table. Same deterministic binning as
    `event_value_histogram`; ln() rounds at 6dp for cross-engine
    parity (the rounded-flag convention used for logits elsewhere)."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    period = F.when(
        F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), "a"
    ).otherwise("b")
    features = F.array(
        F.struct(
            F.lit("event_type").alias("feature"),
            F.col("event_type").alias("bin"),
        ),
        F.struct(
            F.lit("value_bin").alias("feature"),
            F.floor(F.col("value") / F.lit(_HIST_W))
            .cast("long")
            .cast("string")
            .alias("bin"),
        ),
    )
    binned = e.select(
        period.alias("period"), F.explode(features).alias("f")
    ).select("period", "f.feature", "f.bin")
    counts = binned.groupBy("feature", "bin").agg(
        F.count(F.when(F.col("period") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("period") == "b", 1)).alias("cb"),
    )
    totals = counts.groupBy("feature").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    terms = counts.join(totals, "feature").select(
        "feature",
        (F.col("ca") / F.col("na") + _PSI_EPS).alias("p"),
        (F.col("cb") / F.col("nb") + _PSI_EPS).alias("q"),
        "na",
        "nb",
    )
    return terms.groupBy("feature").agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("na").alias("n_period_a"),
        F.max("nb").alias("n_period_b"),
    )


# ---------------------------------------------------------------------------
# schema_drift — structural drift between two schema snapshots
# ---------------------------------------------------------------------------


def schema_drift(before, after) -> list[dict]:
    """Structural companion to `value_drift_psi` (which sees value
    distributions, not shape): diff two Spark schemas into
    (column, change, before_type, after_type) rows — added / removed /
    type_changed. Driver-side metadata only (schemas are KBs at any
    data scale); feed `df.schema` from any two snapshots, or a stored
    profile's schema against today's batch. Additive-only evolution
    (the reference's ALTER ADD COLUMN contract, S10) = a drift report
    with no `removed` and no `type_changed` rows — asserted by the
    warehouse path's monotonicity property test."""
    b = {f.name: f.dataType.simpleString() for f in before.fields}
    a = {f.name: f.dataType.simpleString() for f in after.fields}
    out = []
    for name in sorted(b.keys() | a.keys()):
        if name not in a:
            out.append({"column": name, "change": "removed",
                        "before_type": b[name], "after_type": None})
        elif name not in b:
            out.append({"column": name, "change": "added",
                        "before_type": None, "after_type": a[name]})
        elif b[name] != a[name]:
            out.append({"column": name, "change": "type_changed",
                        "before_type": b[name], "after_type": a[name]})
    return out


_CM_D = 4   # hash rows
_CM_W = 64  # counters per row


def _cm_col_duck(r: str, key: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {_CM_W}"
    )


@query(
    "countmin_user_counts",
    oracle=f"""
    WITH expanded AS (
      SELECT r.r, {_cm_col_duck('r.r', 'e.user_id')} AS col
      FROM events e CROSS JOIN (
        SELECT unnest(range({_CM_D})) AS r) r
    ),
    sketch AS (
      SELECT r, col, CAST(count(*) AS BIGINT) AS cnt
      FROM expanded GROUP BY r, col
    ),
    truth AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_true
      FROM events GROUP BY user_id
    ),
    probes AS (
      SELECT t.user_id, t.n_true, r.r,
             {_cm_col_duck('r.r', 't.user_id')} AS col
      FROM truth t CROSS JOIN (SELECT unnest(range({_CM_D})) AS r) r
    )
    SELECT p.user_id, max(p.n_true) AS n_true,
           CAST(min(s.cnt) AS BIGINT) AS cm_estimate,
           CAST(min(s.cnt) - max(p.n_true) AS BIGINT) AS overestimate
    FROM probes p JOIN sketch s ON s.r = p.r AND s.col = p.col
    GROUP BY p.user_id
    """,
)
def countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public method)
    over per-user event counts: d={_CM_D} portable hash rows x
    w={_CM_W} counters, point estimate = min over rows of the hashed
    counter — always >= the true count (one-sided error), with
    overestimate bounded by collisions (~2N/w in expectation per
    row). The fixed-size MERGEABLE frequency summary that completes
    the sketch family (KMV distincts, quantile sketch, Bloom
    membership): counters are plain sums, so per-partition/per-day
    sketches union by addition — the rollup shape
    `value_quantile_sketch` documents. Emitted next to the exact
    count (oracle-checkable at test SF) so the error is visible.

    Scale: the build is one explode(x{_CM_D}) into a map-side-
    combinable ({_CM_D}x{_CM_W})-cell aggregate — constant-size state
    regardless of corpus; the probe side joins the bounded sketch
    table (broadcastable at any SF)."""
    e = load(spark, sf_dir, "events")
    from ..util import portable_id_hash

    def cm_col(r, key):
        return portable_id_hash(
            F.concat(r.cast("string"), F.lit(":"), key.cast("string"))
        ) % _CM_W

    expanded = e.select(
        F.explode(F.sequence(F.lit(0), F.lit(_CM_D - 1))).alias("r"),
        "user_id",
    ).select("r", cm_col(F.col("r"), F.col("user_id")).alias("col"))
    sketch = expanded.groupBy("r", "col").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    truth = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    probes = truth.select(
        "user_id",
        "n_true",
        F.explode(F.sequence(F.lit(0), F.lit(_CM_D - 1))).alias("r"),
    ).select(
        "user_id", "n_true", "r",
        cm_col(F.col("r"), F.col("user_id")).alias("col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("user_id")
        .agg(
            F.max("n_true").alias("n_true"),
            F.min("cnt").cast("long").alias("cm_estimate"),
            (F.min("cnt") - F.max("n_true")).cast("long").alias(
                "overestimate"
            ),
        )
    )
