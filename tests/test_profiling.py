"""Governance operators (plans/profiling.py): behavioral invariants
beyond the oracle hash-match (which test_oracle_parity already runs
for all four queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstreamtoclickhouse_spark.plans import QUERIES
from clickstreamtoclickhouse_spark.plans.profiling import _QS_W
from clickstreamtoclickhouse_spark.plans.registry import load

from .conftest import SF_DIR, SF_DIR_MED


def test_table_profile_invariants(spark):
    rows = {r["column_name"]: r for r in QUERIES["table_profile"](spark, SF_DIR).collect()}
    n_rows = load(spark, SF_DIR, "events").count()
    assert set(rows) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    for r in rows.values():
        assert r["n_rows"] == n_rows
        assert 0 <= r["n_nulls"] <= n_rows
        assert r["n_distinct"] <= n_rows - r["n_nulls"]
    # event_id is the PK: fully distinct, never null
    assert rows["event_id"]["n_nulls"] == 0
    assert rows["event_id"]["n_distinct"] == n_rows
    assert rows["event_type"]["n_distinct"] <= 10


def test_table_profile_single_scan(spark):
    """The multi-distinct profile must stay ONE pass over events: a
    single parquet scan feeding an Expand, not one scan per column."""
    plan = QUERIES["table_profile"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan, plan


def test_dq_assertions_signal(spark):
    """Clean contracts pass; the deliberately-tight value envelope
    (<=400 vs max ~490) must register real violations — proving the
    counting path, not just the all-zeros path."""
    rows = {r["check_name"]: r for r in QUERIES["dq_assertions"](spark, SF_DIR_MED).collect()}
    assert len(rows) == 11
    for name in ("unique_o_orderkey", "fk_orders_customer", "fk_lineitem_orders",
                 "range_l_discount", "positive_l_quantity"):
        assert rows[name]["n_violations"] == 0 and rows[name]["passed"], name
    env = rows["value_envelope_0_400"]
    assert env["n_violations"] > 0 and not env["passed"]


def test_dq_assertions_detects_planted_violations(spark, tmp_path):
    """Planted dirty rows flip the right checks: duplicate + null-key
    orders, an out-of-range discount, and an orphaned lineitem."""
    sf = str(tmp_path)
    for t in ("orders", "lineitem", "events", "customer"):
        df = load(spark, SF_DIR, t)
        if t == "orders":
            dup = df.limit(1)
            nullcust = (
                df.limit(1)
                .withColumn("o_custkey", F.lit(None).cast("long"))
                .withColumn("o_orderkey", F.lit(-7).cast("long"))
            )
            df = df.unionByName(dup).unionByName(nullcust)
        if t == "lineitem":
            bad = df.limit(1).withColumn("l_discount", F.lit(0.5)).withColumn(
                "l_orderkey", F.lit(-1).cast("long"))
            df = df.unionByName(bad)
        df.write.parquet(f"{sf}/{t}.parquet")
    rows = {r["check_name"]: r for r in QUERIES["dq_assertions"](spark, sf).collect()}
    assert rows["unique_o_orderkey"]["n_violations"] == 1
    assert rows["not_null_o_custkey"]["n_violations"] == 1
    assert rows["range_l_discount"]["n_violations"] == 1
    assert rows["fk_lineitem_orders"]["n_violations"] == 1
    # the planted null-custkey order also orphans an FK row
    assert rows["fk_orders_customer"]["n_violations"] == 1
    assert not rows["unique_o_orderkey"]["passed"]


def test_histogram_partition_of_rows(spark):
    hist = QUERIES["event_value_histogram"](spark, SF_DIR_MED).collect()
    n = load(spark, SF_DIR_MED, "events").filter(F.col("value").isNotNull()).count()
    assert sum(r["n_events"] for r in hist) == n
    for r in hist:
        assert r["bin_hi"] - r["bin_lo"] == 25.0
        assert r["n_events"] > 0


def test_quantile_sketch_error_bound(spark):
    """Each estimate is the upper edge of the covering bin, so it can
    overshoot the exact quantile by at most one bin width and never
    undershoot (cum >= q*total at that bin)."""
    est = {r["quantile"]: r["est_value"]
           for r in QUERIES["value_quantile_sketch"](spark, SF_DIR_MED).collect()}
    vals = load(spark, SF_DIR_MED, "events")
    for q, e in est.items():
        exact = vals.stat.approxQuantile("value", [q], 0.0)[0]
        assert exact <= e <= exact + _QS_W + 1e-9, (q, e, exact)


def test_psi_flags_planted_drift(spark, tmp_path):
    """Stable synthetic data sits far below the 0.1 drift bar; a
    planted period-B type flip pushes event_type PSI past 0.25."""
    stable = {r["feature"]: r["psi"]
              for r in QUERIES["value_drift_psi"](spark, SF_DIR_MED).collect()}
    assert stable["event_type"] < 0.1 and stable["value_bin"] < 0.1

    sf = str(tmp_path)
    e = load(spark, SF_DIR_MED, "events")
    drifted = e.withColumn(
        "event_type",
        F.when(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"), "flood")
        .otherwise(F.col("event_type")),
    )
    drifted.write.parquet(f"{sf}/events.parquet")
    psi = {r["feature"]: r["psi"]
           for r in QUERIES["value_drift_psi"](spark, sf).collect()}
    assert psi["event_type"] > 0.25, psi
    assert psi["value_bin"] < 0.1  # untouched feature stays stable


def test_schema_drift_report(spark):
    from pyspark.sql import types as T

    from clickstreamtoclickhouse_spark.plans.profiling import schema_drift

    before = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("gone", T.StringType()),
    ])
    after = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),   # type change
        T.StructField("fresh", T.BooleanType()),
    ])
    drift = {d["column"]: d for d in schema_drift(before, after)}
    assert drift["gone"]["change"] == "removed"
    assert drift["fresh"]["change"] == "added"
    assert drift["v"]["change"] == "type_changed"
    assert drift["v"]["before_type"] == "double"
    assert schema_drift(before, before) == []
    # real snapshots: identical table dirs -> no drift
    e = load(spark, SF_DIR, "events")
    assert schema_drift(e.schema, e.schema) == []


def test_cuped_shrinks_variance_on_correlated_users(spark, tmp_path):
    """Planted persistent per-user effect: each user's post-period
    value repeats their pre-period value, so cov(pre, post) ~
    var(pre), theta ~ 1, and CUPED should remove nearly all
    between-user variance. On uncorrelated data the adjustment is a
    no-op — this pins that the query actually applies the covariate,
    not just echoes var_post."""
    rows = []
    eid = 0
    for u in range(400):
        base = float((u % 40) * 25)  # user effect, orthogonal to variant hash
        for period, day in ((0, 1), (1, 20)):
            for i in range(4):
                rows.append(
                    (
                        eid,
                        f"2024-01-{day:02d} {i + 1:02d}:00:00",
                        u,
                        "view",
                        base + ((u * 7 + i) % 5),  # deterministic jitter
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = {r["variant"]: r for r in QUERIES["ab_test_cuped"](spark, sf).collect()}
    assert set(out) == {"A", "B"}
    for v, r in out.items():
        # user-effect variance is ~(range of 4*base)^2 >> jitter; CUPED
        # with theta~1 must strip it almost entirely
        assert r["var_adjusted"] < 0.05 * r["var_post"], (v, dict(r.asDict()))
        # the adjustment is mean-preserving up to the covariate shift:
        # adjusted means stay within the raw spread of the two arms
        assert abs(r["mean_adjusted"] - r["mean_post"]) < 4 * 40 * 25


def test_cusum_flags_planted_level_shift(spark, tmp_path):
    """On the stock synthetic series CUSUM stays quiet; tripling the
    per-event value from mid-month on plants a sustained mean shift
    the one-sided positive sum must flag (and the negative side must
    not)."""
    base = {r["d"]: r for r in QUERIES["daily_value_cusum"](spark, SF_DIR_MED).collect()}
    assert all(r["shift_flag"] == 0 for r in base.values()), [
        d for d, r in base.items() if r["shift_flag"]
    ]

    sf = str(tmp_path)
    e = load(spark, SF_DIR_MED, "events")
    shifted = e.withColumn(
        "value",
        F.when(
            F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
            F.col("value") * 3,
        ).otherwise(F.col("value")),
    )
    shifted.write.parquet(f"{sf}/events.parquet")
    out = sorted(
        QUERIES["daily_value_cusum"](spark, sf).collect(), key=lambda r: r["d"]
    )
    flagged = [r for r in out if r["shift_flag"]]
    assert flagged
    # with a pooled baseline the mean sits between the two levels, so
    # BOTH sides react: the negative sum builds over the (now
    # below-mean) first half and only drains after the boundary, the
    # positive sum grows monotonically through the shifted tail
    assert flagged[0]["cusum_neg"] > flagged[0]["cusum_pos"]
    last = out[-1]
    assert last["shift_flag"] == 1 and last["cusum_pos"] > last["cusum_neg"]
    shift_day = next(r for r in out if r["d"] == "2024-01-16")
    assert last["cusum_pos"] > shift_day["cusum_pos"]


def test_bot_scores_flag_planted_metronome(spark, tmp_path):
    """Organic synthetic users all pass (verified in-query above the
    CV bar); a planted client ticking every 30s +- 0.1s must flag,
    and a bursty human-like planted user must not."""
    rows = []
    eid = 10_000_000
    for i in range(60):  # metronome: 30s +- tiny deterministic jitter
        rows.append((eid, 9_000_001, 30.0 * i + 0.01 * (i % 3), "view"))
        eid += 1
    gaps = [1, 2, 400, 5, 3600, 10, 30, 7200, 2, 60]  # bursty human
    t = 0.0
    for i in range(60):
        t += gaps[i % len(gaps)]
        rows.append((eid, 9_000_002, t, "view"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, off double, event_type string"
    ).select(
        "event_id",
        F.expr("timestamp_micros(CAST(1700000000000000 + off * 1000000 AS LONG))").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = {r["user_id"]: r for r in QUERIES["user_bot_scores"](spark, sf).collect()}
    assert out[9_000_001]["bot_flag"] == 1, out[9_000_001]
    assert out[9_000_002]["bot_flag"] == 0, out[9_000_002]
