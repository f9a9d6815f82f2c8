"""Experimentation & causal-inference readouts: the statistics an
A/B-testing platform computes beyond the parametric t-test family
already in ``plans/relational.py`` (ab_test_welch / cuped /
proportions / bootstrap / Wilson / covariate balance / uplift-Qini).

All methods are textbook-public (Mann & Whitney 1947; Pearson's
chi-square; Card & Krueger 1994 diff-in-diff; the delta method for
ratio metrics, e.g. Deng et al. KDD'18 "Applying the Delta Method in
Metric Analytics"; Horvitz & Thompson 1952 / Hájek IPW; Benjamini &
Hochberg 1995 FDR; Abramowitz & Stegun 26.2.17 normal-CDF
approximation). The reference delegates every query to ClickHouse
(SURVEY.md §2.11 extension tier); here each is a native Spark plan
with a DuckDB oracle twin.

Cross-engine determinism stance (the hard part of this family):

- Experiment assignment is ALWAYS ``util.portable_id_hash`` — never
  rand() — so both engines assign identical units.
- Rank statistics (Mann-Whitney) stay in INTEGER arithmetic: with
  per-value tie groups, 2*R_A = sum(n_a(v) * (2*cum_before(v) +
  cnt(v) + 1)) is an exact integer, so U, the tie correction
  sum(t^3 - t), and the z-score all derive from identical integers
  in both engines — no float accumulates across rows.
- Moment statistics (delta-method ratio CI, power/MDE, IPW) use
  cent-exact integer sufficient statistics (BIGINT sums of
  round(value*100) and their squares/cross-products); variances are
  scalar double arithmetic on those exact integers. At 100 TB the
  BIGINT sums become DECIMAL(38,0) (the markov_attribution stance);
  the plan shape is unchanged.
- p-values use one explicit rational normal-CDF approximation
  (A&S 26.2.17, |error| < 7.5e-8) spelled out with identical
  literals in the Spark Column expression and the oracle SQL, so
  both engines evaluate the same scalar formula.

Scale stance, per operator:

- ``mann_whitney_u``: one map-side-combinable aggregate to the
  per-distinct-value tie table (value is a 2-decimal metric: the tie
  table is domain-bounded, ~18k rows at sf0.1 for 100k events), one
  cumulative window over THAT table, one final 1-row aggregate. The
  global-order window runs over the tie table, never over events.
- ``chi_square_independence``: one grid-keyed aggregate; the
  expected-count grid is a broadcast cross of two tiny total tables
  (n_event_types x 2 variants); every window runs over the grid.
- ``diff_in_diff`` / ``ab_power_mde``: one aggregate to a 4-cell /
  2-cell table, then 1-row scalar algebra. Nothing else moves.
- ``ratio_metric_delta_ci``: one shuffle to per-user sums (the unit
  of randomization), one aggregate to 2 variant rows of integer
  sufficient statistics. Linear, no window over rows.
- ``ipw_treatment_effect``: one aggregate to the per-stratum
  sufficient-statistics table (n_event_types rows); Hájek weights
  fold in with a 1-row final aggregate.
- ``bh_fdr_report``: one aggregate to n_event_types rows; the BH
  step-up runs two windows over those few rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import portable_id_hash, portable_id_hash_duck
from .registry import load, query

_Z975 = 1.959964  # Phi^-1(0.975), two-sided 5% critical value
_Z80 = 0.841621  # Phi^-1(0.80), 80% power

# Abramowitz & Stegun 26.2.17 upper-tail normal CDF approximation
_AS_P = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def _variant(col: str = "user_id") -> Column:
    """Deterministic 50/50 assignment — same rule as ab_test_welch."""
    return (
        F.when(F.pmod(portable_id_hash(col), F.lit(2)) == 0, "A")
        .otherwise("B")
        .alias("variant")
    )


_SQL_VARIANT = (
    "CASE WHEN "
    + portable_id_hash_duck("CAST(user_id AS VARCHAR)")
    + " % 2 = 0 THEN 'A' ELSE 'B' END"
)


def _phi_upper_tail(az: Column) -> Column:
    """P(Z > az) for az >= 0 via A&S 26.2.17 — the identical rational
    polynomial is inlined in every oracle that needs a p-value."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
    b1, b2, b3, b4, b5 = _AS_B
    poly = t * (
        F.lit(b1)
        + t * (F.lit(b2) + t * (F.lit(b3) + t * (F.lit(b4) + t * F.lit(b5))))
    )
    pdf = F.lit(_INV_SQRT_2PI) * F.exp(-az * az / F.lit(2.0))
    return pdf * poly


def _phi_upper_tail_sql(az: str) -> str:
    b1, b2, b3, b4, b5 = _AS_B
    t = f"(1.0 / (1.0 + {_AS_P} * {az}))"
    poly = f"({t} * ({b1} + {t} * ({b2} + {t} * ({b3} + {t} * ({b4} + {t} * {b5})))))"
    return f"({_INV_SQRT_2PI} * exp(-({az}) * ({az}) / 2.0) * {poly})"


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) — nonparametric two-sample test
# ---------------------------------------------------------------------------


@query(
    "mann_whitney_u",
    oracle=f"""
    WITH assign AS (
      SELECT {_SQL_VARIANT} AS variant, value
      FROM events WHERE value IS NOT NULL
    ),
    pv AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a_v
      FROM assign GROUP BY value
    ),
    cum AS (
      SELECT cnt, n_a_v,
             coalesce(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM pv
    ),
    agg AS (
      SELECT sum(n_a_v * (2 * cum_before + cnt + 1)) AS two_r_a,
             sum(n_a_v) AS n_a, sum(cnt) AS n,
             sum(cnt * cnt * cnt - cnt) AS tie
      FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n - n_a AS BIGINT) AS n_b,
           round((two_r_a - n_a * (n_a + 1)) / 2.0, 1) AS u_a,
           round(n_a * (n - n_a) - (two_r_a - n_a * (n_a + 1)) / 2.0, 1)
             AS u_b,
           round(((two_r_a - n_a * (n_a + 1)) / 2.0
                  - n_a * (n - n_a) / 2.0)
                 / sqrt((n_a * 1.0 * (n - n_a) / 12.0)
                        * ((n + 1) - tie * 1.0 / (n * (n - 1.0)))), 6)
             AS z_stat
    FROM agg
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test of value by experiment
    variant — the nonparametric companion to ab_test_welch for skewed
    metrics (revenue-like distributions where the t-test's mean is
    fragile). Tie-corrected normal approximation.

    Integer-exact ranks: with values grouped into tie classes, the
    average rank of class v is cum_before(v) + (cnt(v)+1)/2, so
    2*R_A accumulates as an exact BIGINT (see module docstring) and
    both engines compute z from identical integers.

    Scale: the rank window runs over the per-distinct-value tie table
    (domain-bounded: value is a 2-decimal metric), not over events;
    the events pass itself is one map-side-combinable aggregate."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pv = (
        e.select(_variant(), "value")
        .groupBy("value")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
            .cast("long")
            .alias("n_a_v"),
        )
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    cum = pv.select(
        "cnt",
        "n_a_v",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    agg = cum.agg(
        F.sum(
            F.col("n_a_v") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("two_r_a"),
        F.sum("n_a_v").alias("n_a"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tie"
        ),
    )
    n_a, n, two_r_a = F.col("n_a"), F.col("n"), F.col("two_r_a")
    u_a = (two_r_a - n_a * (n_a + 1)) / 2.0
    n_b = n - n_a
    sigma = F.sqrt(
        (n_a * 1.0 * n_b / 12.0)
        * ((n + 1) - F.col("tie") * 1.0 / (n * (n - 1.0)))
    )
    return agg.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round(n_a * n_b - u_a, 1).alias("u_b"),
        F.round((u_a - n_a * n_b / 2.0) / sigma, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (event_type x variant)
# ---------------------------------------------------------------------------


@query(
    "chi_square_independence",
    oracle=f"""
    WITH assign AS (
      SELECT event_type, {_SQL_VARIANT} AS variant FROM events
    ),
    cells AS (
      SELECT event_type, variant, CAST(count(*) AS BIGINT) AS observed
      FROM assign GROUP BY event_type, variant
    ),
    rows_t AS (
      SELECT event_type, CAST(sum(observed) AS BIGINT) AS r_tot FROM cells
      GROUP BY event_type
    ),
    cols_t AS (
      SELECT variant, CAST(sum(observed) AS BIGINT) AS c_tot FROM cells
      GROUP BY variant
    ),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells),
    grid AS (
      SELECT r.event_type, c.variant, r.r_tot, c.c_tot, t.n,
             coalesce(o.observed, 0) AS observed,
             r.r_tot * c.c_tot / (t.n * 1.0) AS expected
      FROM rows_t r CROSS JOIN cols_t c CROSS JOIN tot t
      LEFT JOIN cells o
        ON o.event_type = r.event_type AND o.variant = c.variant
    ),
    scored AS (
      SELECT event_type, variant, observed, n,
             round(expected, 4) AS expected,
             round((observed - expected) / sqrt(expected), 4)
               AS std_residual,
             (observed - expected) * (observed - expected) / expected
               AS term
      FROM grid
    ),
    dims AS (
      SELECT count(DISTINCT event_type) AS nr, count(DISTINCT variant) AS nc
      FROM scored
    )
    SELECT s.event_type, s.variant, s.observed, s.expected, s.std_residual,
           round(sum(s.term) OVER (), 6) AS chi2,
           CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS dof,
           round(sqrt(sum(s.term) OVER ()
                      / (s.n * least(d.nr - 1, d.nc - 1))), 6) AS cramers_v
    FROM scored s CROSS JOIN dims d
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event_type and
    experiment variant — the sample-ratio-mismatch / randomization
    check an experimentation platform runs before trusting any
    metric readout. Emits the full contingency grid (observed,
    expected, standardized residual per cell) with the chi-square
    statistic, degrees of freedom, and Cramér's V repeated per row
    (the classifier_eval_report convention for scalar-over-grid).

    The grid is rebuilt as (row totals) x (column totals) so
    zero-observed cells still contribute their expected mass —
    dropping them (what a bare groupBy would do) understates the
    statistic.

    Scale: one grid-keyed aggregate over events; everything after
    runs over the n_event_types x 2 grid (broadcast crosses of tiny
    total tables; windows over the grid only)."""
    e = load(spark, sf_dir, "events")
    cells = (
        e.select("event_type", _variant())
        .groupBy("event_type", "variant")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
        # r14: cells feeds row totals, column totals, the grand total
        # AND the grid join — unpinned, the events aggregate ran 4x
        # (14 scans). Grid-bounded rows, one execution (guide §3.3).
        .localCheckpoint(eager=False)
    )
    rows_t = cells.groupBy("event_type").agg(
        F.sum("observed").cast("long").alias("r_tot")
    )
    cols_t = cells.groupBy("variant").agg(
        F.sum("observed").cast("long").alias("c_tot")
    )
    tot = cells.agg(F.sum("observed").cast("long").alias("n"))
    grid = (
        rows_t.crossJoin(F.broadcast(cols_t))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cells), ["event_type", "variant"], "left")
        .select(
            "event_type",
            "variant",
            "n",
            F.coalesce(F.col("observed"), F.lit(0)).alias("observed"),
            (F.col("r_tot") * F.col("c_tot") / (F.col("n") * 1.0)).alias(
                "expected_raw"
            ),
        )
    )
    scored = grid.select(
        "event_type",
        "variant",
        "observed",
        "n",
        F.round("expected_raw", 4).alias("expected"),
        F.round(
            (F.col("observed") - F.col("expected_raw"))
            / F.sqrt("expected_raw"),
            4,
        ).alias("std_residual"),
        (
            (F.col("observed") - F.col("expected_raw"))
            * (F.col("observed") - F.col("expected_raw"))
            / F.col("expected_raw")
        ).alias("term"),
    )
    dims = scored.agg(
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("variant").alias("nc"),
    )
    wall = Window.partitionBy()
    return scored.crossJoin(F.broadcast(dims)).select(
        "event_type",
        "variant",
        "observed",
        "expected",
        "std_residual",
        F.round(F.sum("term").over(wall), 6).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                F.sum("term").over(wall)
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------

_DID_POST_DAY = 16  # Jan 1-15 = pre period, Jan 16+ = post period


@query(
    "diff_in_diff",
    oracle=f"""
    WITH assign AS (
      SELECT CASE WHEN {portable_id_hash_duck("CAST(user_id AS VARCHAR)")}
                  % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN CAST(extract(day FROM ts) AS INTEGER)
                  >= {_DID_POST_DAY} THEN 1 ELSE 0 END AS post,
             value
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    cells AS (
      SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             round(avg(value), 6) AS mean, round(var_samp(value), 6) AS var
      FROM assign GROUP BY treated, post
    ),
    wide AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c_post,
        max(CASE WHEN treated = 1 AND post = 0 THEN mean END) AS mean_t_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN mean END) AS mean_t_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN mean END) AS mean_c_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN mean END) AS mean_c_post,
        max(CASE WHEN treated = 1 AND post = 0 THEN var / n END) AS v_t_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN var / n END) AS v_t_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN var / n END) AS v_c_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN var / n END) AS v_c_post
      FROM cells
    )
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           mean_t_pre, mean_t_post, mean_c_pre, mean_c_post,
           round((mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre), 6)
             AS did,
           round(sqrt(v_t_pre + v_t_post + v_c_pre + v_c_post), 6) AS se,
           round(((mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre))
                 / nullif(sqrt(v_t_pre + v_t_post + v_c_pre + v_c_post), 0),
                 4) AS t_stat
    FROM wide
    """,
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of a treatment effect on
    value: treated cohort = the portable-hash half of users, post
    period = events on/after Jan 16 (the testdata span's midpoint).
    DiD = (treated post - pre) - (control post - pre), with the
    standard 4-cell normal SE sqrt(sum var_cell/n_cell). The 2x2
    design is the canonical launch-readout when randomization happens
    at a calendar boundary (Card & Krueger 1994 — public method).

    Determinism: the estimate derives from the 6dp-ROUNDED per-cell
    means/variances (the ab_test_welch stance), so both engines do
    identical scalar algebra.

    Scale: one aggregate to 4 cells; 1-row output."""
    e = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    assign = e.select(
        F.when(F.pmod(portable_id_hash("user_id"), F.lit(2)) == 0, 1)
        .otherwise(0)
        .alias("treated"),
        F.when(F.dayofmonth("ts") >= _DID_POST_DAY, 1)
        .otherwise(0)
        .alias("post"),
        "value",
    )
    cells = assign.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.round(F.var_samp("value"), 6).alias("var"),
    )

    def cell(col: str, t: int, p: int) -> Column:
        base = F.col(col) / F.col("n") if col == "var" else F.col(col)
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), base)
        )

    wide = cells.agg(
        cell("n", 1, 0).alias("n_t_pre"),
        cell("n", 1, 1).alias("n_t_post"),
        cell("n", 0, 0).alias("n_c_pre"),
        cell("n", 0, 1).alias("n_c_post"),
        cell("mean", 1, 0).alias("mean_t_pre"),
        cell("mean", 1, 1).alias("mean_t_post"),
        cell("mean", 0, 0).alias("mean_c_pre"),
        cell("mean", 0, 1).alias("mean_c_post"),
        cell("var", 1, 0).alias("v_t_pre"),
        cell("var", 1, 1).alias("v_t_post"),
        cell("var", 0, 0).alias("v_c_pre"),
        cell("var", 0, 1).alias("v_c_post"),
    )
    did = (F.col("mean_t_post") - F.col("mean_t_pre")) - (
        F.col("mean_c_post") - F.col("mean_c_pre")
    )
    se = F.sqrt(
        F.col("v_t_pre")
        + F.col("v_t_post")
        + F.col("v_c_pre")
        + F.col("v_c_post")
    )
    return wide.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        "mean_t_pre",
        "mean_t_post",
        "mean_c_pre",
        "mean_c_post",
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / F.nullif(se, F.lit(0.0)), 4).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (value per event, per user)
# ---------------------------------------------------------------------------


@query(
    "ratio_metric_delta_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT {_SQL_VARIANT} AS variant,
             CAST(round(sum(value) * 100) AS BIGINT) AS x_c,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY variant, user_id
    ),
    stats AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             sum(x_c) AS sx, sum(x_c * x_c) AS sxx,
             sum(y) AS sy, sum(y * y) AS syy,
             sum(x_c * y) AS sxy
      FROM per_user GROUP BY variant
    ),
    derived AS (
      SELECT variant, n,
             sx / 100.0 / n AS mx, sy * 1.0 / n AS my,
             (sxx / 10000.0 - (sx / 100.0) * (sx / 100.0) / n)
               / nullif(n - 1, 0) AS vx,
             (syy * 1.0 - sy * 1.0 * sy / n) / nullif(n - 1, 0) AS vy,
             (sxy / 100.0 - (sx / 100.0) * sy / n) / nullif(n - 1, 0)
               AS cxy
      FROM stats
    )
    SELECT variant, n,
           round(mx / my, 6) AS ratio,
           round(sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS se,
           round(mx / my - {_Z975} * sqrt((vx - 2 * (mx / my) * cxy
                 + (mx / my) * (mx / my) * vy) / n) / my, 6) AS ci_lo,
           round(mx / my + {_Z975} * sqrt((vx - 2 * (mx / my) * cxy
                 + (mx / my) * (mx / my) * vy) / n) / my, 6) AS ci_hi
    FROM derived ORDER BY variant
    """,
)
def ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric —
    value-per-event where the unit of randomization is the user, not
    the event (Deng et al., KDD'18, public method): naive per-event
    CIs are wrong because events within a user are correlated. Per
    variant: ratio = mean(user value sum)/mean(user event count),
    Var(ratio) via the first-order Taylor expansion
    (vx - 2R*cxy + R^2*vy) / (n * my^2).

    Determinism: per-user sums collapse to cent-exact BIGINTs, and
    variance/covariance derive from exact integer sufficient
    statistics (sum x, sum x^2, sum xy) — no float accumulates across
    users in either engine. At 100 TB the sums become DECIMAL(38,0).

    Scale: one shuffle to per-user grain, one aggregate to 2 variant
    rows. Linear; no windows."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    per_user = (
        e.select(_variant(), "user_id", "value")
        .groupBy("variant", "user_id")
        .agg(
            F.round(F.sum("value") * 100).cast("long").alias("x_c"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
    )
    stats = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_c").alias("sx"),
        F.sum(F.col("x_c") * F.col("x_c")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x_c") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    nm1 = F.nullif(n - 1, F.lit(0))  # 1-user variants: variance undefined
    mx = F.col("sx") / 100.0 / n
    my = F.col("sy") * 1.0 / n
    vx = (F.col("sxx") / 10000.0 - (F.col("sx") / 100.0) * (F.col("sx") / 100.0) / n) / nm1
    vy = (F.col("syy") * 1.0 - F.col("sy") * 1.0 * F.col("sy") / n) / nm1
    cxy = (F.col("sxy") / 100.0 - (F.col("sx") / 100.0) * F.col("sy") / n) / nm1
    ratio = mx / my
    se = F.sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy) / n) / my
    return stats.select(
        "variant",
        "n",
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(ratio - _Z975 * se, 6).alias("ci_lo"),
        F.round(ratio + _Z975 * se, 6).alias("ci_hi"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# Power analysis: minimum detectable effect at the observed sample size
# ---------------------------------------------------------------------------


@query(
    "ab_power_mde",
    oracle=f"""
    WITH assign AS (
      SELECT {_SQL_VARIANT} AS variant,
             CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             sum(v_c) AS s, sum(v_c * v_c) AS ss
      FROM assign GROUP BY variant
    ),
    derived AS (
      SELECT variant, n, s / 100.0 / n AS mean,
             (ss / 10000.0 - (s / 100.0) * (s / 100.0) / n)
               / nullif(n - 1, 0) AS var
      FROM stats
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 'A' THEN n END) AS n_a,
             max(CASE WHEN variant = 'B' THEN n END) AS n_b,
             max(CASE WHEN variant = 'A' THEN mean END) AS mean_a,
             max(CASE WHEN variant = 'B' THEN mean END) AS mean_b,
             max(CASE WHEN variant = 'A' THEN var END) AS var_a,
             max(CASE WHEN variant = 'B' THEN var END) AS var_b
      FROM derived
    )
    SELECT n_a, n_b, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(({_Z975} + {_Z80})
                 * sqrt(var_a / n_a + var_b / n_b), 6) AS mde_abs,
           round(({_Z975} + {_Z80})
                 * sqrt(var_a / n_a + var_b / n_b) / mean_b, 6) AS mde_rel
    FROM wide
    """,
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at the OBSERVED sample size and
    variance — the power-analysis readout that tells an experimenter
    whether a flat result is 'no effect' or 'underpowered': at
    alpha=0.05 two-sided and 80% power, MDE = (z_{{0.975}} + z_{{0.80}})
    * SE(diff). Emitted both absolute and relative to the control
    mean (variant B).

    Determinism: cent-exact integer sufficient statistics (same
    stance as ratio_metric_delta_ci) — mean/var are scalar doubles
    from exact BIGINTs.

    Scale: one aggregate to 2 rows; 1-row output."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    stats = (
        e.select(
            _variant(), F.round(F.col("value") * 100).cast("long").alias("v_c")
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v_c").alias("s"),
            F.sum(F.col("v_c") * F.col("v_c")).alias("ss"),
        )
    )
    derived = stats.select(
        "variant",
        "n",
        (F.col("s") / 100.0 / F.col("n")).alias("mean"),
        (
            (
                F.col("ss") / 10000.0
                - (F.col("s") / 100.0) * (F.col("s") / 100.0) / F.col("n")
            )
            # 1-row variants: variance undefined, not a crash (ANSI-safe;
            # same nullif stance as ab_sequential_msprt).
            / F.nullif(F.col("n") - 1, F.lit(0))
        ).alias("var"),
    )
    wide = derived.agg(
        *[
            F.max(F.when(F.col("variant") == v, F.col(c))).alias(
                f"{c}_{v.lower()}"
            )
            for c in ("n", "mean", "var")
            for v in ("A", "B")
        ]
    )
    se = F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
    mde = (_Z975 + _Z80) * se
    return wide.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("mean_b"), 6).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# Inverse-propensity-weighted treatment effect (observational)
# ---------------------------------------------------------------------------


@query(
    "ipw_treatment_effect",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             CASE WHEN {portable_id_hash_duck("CAST(event_id AS VARCHAR)")}
                  % 10 < 2 + ({portable_id_hash_duck("event_type")} % 4)
                  THEN 1 ELSE 0 END AS treated,
             CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events WHERE value IS NOT NULL
    ),
    strata AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(treated) AS BIGINT) AS n_t,
             sum(CASE WHEN treated = 1 THEN v_c ELSE 0 END) AS s_t,
             sum(CASE WHEN treated = 0 THEN v_c ELSE 0 END) AS s_c
      FROM obs GROUP BY event_type
    ),
    kept AS (
      SELECT * FROM strata WHERE n_t > 0 AND n_t < n
    ),
    folded AS (
      SELECT CAST((SELECT count(*) FROM strata) - count(*) AS BIGINT)
               AS n_strata_dropped,
             CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(n_t) AS BIGINT) AS n_treated,
             sum((s_t / 100.0) / (n_t * 1.0 / n)) AS wy_t,
             sum(n_t / (n_t * 1.0 / n)) AS w_t,
             sum((s_c / 100.0) / (1.0 - n_t * 1.0 / n)) AS wy_c,
             sum((n - n_t) / (1.0 - n_t * 1.0 / n)) AS w_c,
             sum(s_t) / 100.0 AS sum_t, sum(s_c) / 100.0 AS sum_c
      FROM kept
    )
    SELECT n, n_treated, n_strata, n_strata_dropped,
           round(wy_t / w_t - wy_c / w_c, 6) AS ate_ipw,
           round(sum_t / n_treated - sum_c / (n - n_treated), 6)
             AS naive_diff
    FROM folded
    """,
)
def ipw_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hájek inverse-propensity-weighted average treatment effect for
    an OBSERVATIONAL exposure whose assignment probability varies by
    stratum (event_type) — the estimator a data team reaches for when
    the 'treatment' (a feature rollout, an exposure) was not uniformly
    randomized (Horvitz-Thompson 1952 / Hájek; public method). The
    deterministic exposure rule p(stratum) in [0.2, 0.5] is the
    substitution point for a real exposure column; the propensity is
    estimated per stratum from the data itself (n_t/n), exactly what
    a stratified-propensity pipeline does.

    Also emits the naive (confounded) difference so the report shows
    what the weighting corrected.

    Positivity/overlap: strata that are all-control or all-treated
    (estimated propensity 0 or 1) are excluded from BOTH estimators —
    the standard overlap restriction — and `n_strata_dropped` reports
    how many were excluded, so the estimand change is visible.

    Determinism: per-stratum cent-exact integer sums; Hájek folding
    is scalar arithmetic over the n_event_types-row strata table in
    a fixed formula — the cross-stratum float sums run over ~5
    values in both engines (round-6dp safe).

    Scale: one aggregate to n_event_types rows, then a 1-row fold."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    obs = e.select(
        "event_type",
        F.when(
            F.pmod(portable_id_hash("event_id"), F.lit(10))
            < 2 + F.pmod(portable_id_hash("event_type"), F.lit(4)),
            1,
        )
        .otherwise(0)
        .alias("treated"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    strata = obs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("v_c")).otherwise(0)).alias(
            "s_t"
        ),
        F.sum(F.when(F.col("treated") == 0, F.col("v_c")).otherwise(0)).alias(
            "s_c"
        ),
    )
    prop = F.col("n_t") * 1.0 / F.col("n")
    # Positivity/overlap restriction: a stratum that is all-control
    # (n_t=0, prop=0) or all-treated (n_t=n, 1-prop=0) has no valid
    # IPW contribution and would divide by zero under ANSI — drop it
    # and report the dropped count so the estimand restriction is
    # visible in the output (standard overlap assumption).
    ok = (F.col("n_t") > 0) & (F.col("n_t") < F.col("n"))
    folded = strata.agg(
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias(
            "n_strata_dropped"
        ),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_strata"),
        F.sum(F.when(ok, F.col("n"))).cast("long").alias("n"),
        F.sum(F.when(ok, F.col("n_t"))).cast("long").alias("n_treated"),
        F.sum(F.when(ok, (F.col("s_t") / 100.0) / prop)).alias("wy_t"),
        F.sum(F.when(ok, F.col("n_t") / prop)).alias("w_t"),
        F.sum(F.when(ok, (F.col("s_c") / 100.0) / (1.0 - prop))).alias(
            "wy_c"
        ),
        F.sum(F.when(ok, (F.col("n") - F.col("n_t")) / (1.0 - prop))).alias(
            "w_c"
        ),
        (F.sum(F.when(ok, F.col("s_t"))) / 100.0).alias("sum_t"),
        (F.sum(F.when(ok, F.col("s_c"))) / 100.0).alias("sum_c"),
    )
    return folded.select(
        "n",
        "n_treated",
        "n_strata",
        "n_strata_dropped",
        F.round(F.col("wy_t") / F.col("w_t") - F.col("wy_c") / F.col("w_c"), 6)
        .alias("ate_ipw"),
        F.round(
            F.col("sum_t") / F.col("n_treated")
            - F.col("sum_c") / (F.col("n") - F.col("n_treated")),
            6,
        ).alias("naive_diff"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-segment proportion tests
# ---------------------------------------------------------------------------

_BH_CONV_THRESHOLD = 75.0  # conversion := value > threshold
_BH_ALPHA = 0.05


@query(
    "bh_fdr_report",
    oracle=f"""
    WITH assign AS (
      SELECT event_type, {_SQL_VARIANT} AS variant,
             CASE WHEN value > {_BH_CONV_THRESHOLD} THEN 1 ELSE 0 END AS conv
      FROM events WHERE value IS NOT NULL
    ),
    seg AS (
      SELECT event_type,
             CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END)
               AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END)
               AS BIGINT) AS c_b
      FROM assign GROUP BY event_type
    ),
    ztab AS (
      SELECT event_type, n_a, n_b,
             round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                   / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                          * (1.0 - (c_a + c_b) * 1.0 / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b)), 6) AS z
      FROM seg
    ),
    ptab AS (
      SELECT event_type, n_a, n_b, z,
             round(2 * {_phi_upper_tail_sql("abs(z)")}, 8) AS p_value
      FROM ztab
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_value, event_type)
                     AS BIGINT) AS p_rank,
             count(*) OVER () AS m
      FROM ptab
    )
    SELECT event_type, n_a, n_b, z, p_value, p_rank,
           round(least(min(p_value * m * 1.0 / p_rank)
                   OVER (ORDER BY p_rank DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 1.0), 6) AS bh_q,
           CASE WHEN least(min(p_value * m * 1.0 / p_rank)
                   OVER (ORDER BY p_rank DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 1.0) <= {_BH_ALPHA} THEN 1 ELSE 0 END AS significant
    FROM ranked
    """,
)
def bh_fdr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over per-segment two-proportion
    z-tests — the multiple-comparisons guard for the 'which segments
    moved?' readout (testing every event_type inflates false
    positives; BH 1995 step-up bounds the false-discovery rate).
    Conversion := value > {_BH_CONV_THRESHOLD}; per event_type a pooled
    two-proportion z between variants, a p-value via the A&S 26.2.17
    normal-CDF polynomial (identical literals in both engines), and
    the BH-adjusted q = min over j>=rank of p_j * m / j (the reverse
    running-min form of the step-up).

    Determinism: z derives from exact integer counts; the p-value is
    one fixed scalar polynomial of the 6dp-rounded z, rounded to 8dp
    before the BH windows so rank order is engine-identical.

    Scale: one aggregate to n_event_types rows; both windows (rank,
    reverse running-min) run over that bounded segment table."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    assign = e.select(
        "event_type",
        _variant(),
        F.when(F.col("value") > _BH_CONV_THRESHOLD, 1).otherwise(0).alias(
            "conv"
        ),
    )
    seg = assign.groupBy("event_type").agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z = (
        F.col("c_a") * 1.0 / F.col("n_a") - F.col("c_b") * 1.0 / F.col("n_b")
    ) / F.sqrt(
        pooled * (1.0 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    ztab = seg.select(
        "event_type", "n_a", "n_b", F.round(z, 6).alias("z")
    )
    ptab = ztab.withColumn(
        "p_value", F.round(2 * _phi_upper_tail(F.abs(F.col("z"))), 8)
    )
    w_rank = Window.orderBy("p_value", "event_type")
    wall = Window.partitionBy()
    ranked = ptab.select(
        "*",
        F.row_number().over(w_rank).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    w_rev = Window.orderBy(F.desc("p_rank")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bh_q = F.least(
        F.min(F.col("p_value") * F.col("m") * 1.0 / F.col("p_rank")).over(
            w_rev
        ),
        F.lit(1.0),
    )
    return ranked.select(
        "event_type",
        "n_a",
        "n_b",
        "z",
        "p_value",
        "p_rank",
        F.round(bh_q, 6).alias("bh_q"),
        # Standard BH step-up rejects at p_(i) <= alpha*i/m, i.e. q <= alpha
        # (boundary inclusive), mirrored in the oracle.
        F.when(bh_q <= _BH_ALPHA, 1).otherwise(0).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Granger-style lag regression between two daily series
# ---------------------------------------------------------------------------


@query(
    "granger_lag_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0)
               AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY d
    ),
    lagged AS (
      SELECT y,
             lag(y) OVER (ORDER BY d) AS a,
             lag(x) OVER (ORDER BY d) AS b
      FROM daily
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(a) AS sa, sum(b) AS sb, sum(y) AS sy,
             sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab,
             sum(a * y) AS say, sum(b * y) AS sby, sum(y * y) AS syy
      FROM lagged WHERE a IS NOT NULL
    ),
    cen AS (
      SELECT n,
             saa - sa * 1.0 * sa / n AS caa,
             sbb - sb * 1.0 * sb / n AS cbb,
             sab - sa * 1.0 * sb / n AS cab,
             say - sa * 1.0 * sy / n AS cay,
             sby - sb * 1.0 * sy / n AS cby,
             syy - sy * 1.0 * sy / n AS cyy
      FROM mom
    ),
    fit AS (
      SELECT n, cay, cby, cyy, caa,
             (cbb * cay - cab * cby) / nullif(caa * cbb - cab * cab, 0)
               AS beta_a,
             (caa * cby - cab * cay) / nullif(caa * cbb - cab * cab, 0)
               AS beta_b
      FROM cen
    )
    SELECT n AS n_days,
           round(beta_a, 6) AS beta_ylag,
           round(beta_b / 100.0, 6) AS beta_xlag,
           round(1 - (cyy - cay * cay / nullif(caa, 0)) / nullif(cyy, 0), 6)
             AS r2_restricted,
           round(1 - (cyy - beta_a * cay - beta_b * cby) / nullif(cyy, 0), 6)
             AS r2_full,
           round(((cyy - cay * cay / nullif(caa, 0))
                  - (cyy - beta_a * cay - beta_b * cby)) * (n - 3)
                 / nullif(cyy - beta_a * cay - beta_b * cby, 0), 4)
             AS f_stat
    FROM fit
    """,
)
def granger_lag_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style lag-1 predictive test between two daily series
    (Granger 1969, public method): does yesterday's CLICK volume
    predict today's PURCHASE revenue beyond what yesterday's revenue
    already does? Restricted model y_t ~ y_{t-1} vs full model
    y_t ~ y_{t-1} + x_{t-1}; reports both R^2 and the nested-model
    F statistic (1 added regressor, n-3 residual dof). beta_xlag is
    emitted in value units per click (the cents lattice divides out).

    Determinism: daily series are exact BIGINTs (counts and
    integer-cents sums), all 9 regression moments are exact integer
    sums, and the closed-form two-regressor OLS (normal equations
    via centered moments) is fixed scalar algebra over them —
    identical doubles in both engines.

    Scale: one map-side-combinable aggregate to the per-day table
    (365 rows/year regardless of event count); the lag window and
    the regression run over that bounded series."""
    e = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("y"),
        )
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "y", F.lag("y").over(w).alias("a"), F.lag("x").over(w).alias("b")
    ).where(F.col("a").isNotNull())
    mom = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum("y").alias("sy"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("y")).alias("say"),
        F.sum(F.col("b") * F.col("y")).alias("sby"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    caa = F.col("saa") - F.col("sa") * 1.0 * F.col("sa") / n
    cbb = F.col("sbb") - F.col("sb") * 1.0 * F.col("sb") / n
    cab = F.col("sab") - F.col("sa") * 1.0 * F.col("sb") / n
    cay = F.col("say") - F.col("sa") * 1.0 * F.col("sy") / n
    cby = F.col("sby") - F.col("sb") * 1.0 * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * 1.0 * F.col("sy") / n
    det = F.nullif(caa * cbb - cab * cab, F.lit(0.0))
    beta_a = (cbb * cay - cab * cby) / det
    beta_b = (caa * cby - cab * cay) / det
    rss_r = cyy - cay * cay / F.nullif(caa, F.lit(0.0))
    rss_f = cyy - beta_a * cay - beta_b * cby
    return mom.select(
        n.alias("n_days"),
        F.round(beta_a, 6).alias("beta_ylag"),
        F.round(beta_b / 100.0, 6).alias("beta_xlag"),
        F.round(1 - rss_r / F.nullif(cyy, F.lit(0.0)), 6).alias(
            "r2_restricted"
        ),
        F.round(1 - rss_f / F.nullif(cyy, F.lit(0.0)), 6).alias("r2_full"),
        F.round(
            (rss_r - rss_f) * (n - 3) / F.nullif(rss_f, F.lit(0.0)), 4
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Always-valid inference: mixture SPRT p-value
# ---------------------------------------------------------------------------

_MSPRT_TAU2 = 0.01  # mixture (prior) variance on the effect size


@query(
    "ab_sequential_msprt",
    oracle=f"""
    WITH assign AS (
      SELECT {_SQL_VARIANT} AS variant,
             CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             sum(v_c) AS s, sum(v_c * v_c) AS ss
      FROM assign GROUP BY variant
    ),
    derived AS (
      SELECT variant, n, s / 100.0 / n AS mean,
             (ss / 10000.0 - (s / 100.0) * (s / 100.0) / n)
               / nullif(n - 1, 0) AS var
      FROM stats
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 'A' THEN n END) AS n_a,
             max(CASE WHEN variant = 'B' THEN n END) AS n_b,
             max(CASE WHEN variant = 'A' THEN mean END) AS mean_a,
             max(CASE WHEN variant = 'B' THEN mean END) AS mean_b,
             max(CASE WHEN variant = 'A' THEN var END) AS var_a,
             max(CASE WHEN variant = 'B' THEN var END) AS var_b
      FROM derived
    ),
    lam AS (
      SELECT n_a, n_b,
             mean_a - mean_b AS delta,
             var_a / n_a + var_b / n_b AS v
      FROM wide
    )
    SELECT n_a, n_b, round(delta, 6) AS delta,
           round(sqrt(v / (v + {_MSPRT_TAU2}))
                 * exp(delta * delta * {_MSPRT_TAU2}
                       / (2.0 * v * (v + {_MSPRT_TAU2}))), 6)
             AS likelihood_ratio,
           round(least(1.0, 1.0
                 / (sqrt(v / (v + {_MSPRT_TAU2}))
                    * exp(delta * delta * {_MSPRT_TAU2}
                          / (2.0 * v * (v + {_MSPRT_TAU2}))))), 6)
             AS p_always_valid
    FROM lam
    """,
)
def ab_sequential_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid p-value via the mixture Sequential Probability
    Ratio Test (Johari, Koomen, Pekelis & Walsh, KDD'17 'Peeking at
    A/B Tests', public method): the inference that stays valid under
    CONTINUOUS MONITORING — an experimenter peeking every day inflates
    fixed-horizon false positives, while p_always_valid = min(1,
    1/Lambda_n) is a supermartingale bound at every n. Lambda_n is
    the normal mixture likelihood ratio with prior effect variance
    tau^2 = {_MSPRT_TAU2}: sqrt(V/(V+tau^2)) *
    exp(delta^2 tau^2 / (2 V (V+tau^2))), V = var_a/n_a + var_b/n_b.

    Determinism: cent-exact integer sufficient statistics (the
    ab_power_mde stance); Lambda is one fixed scalar formula over
    them — exp/sqrt evaluate identical doubles in both engines and
    the result rounds at 6dp.

    Scale: one aggregate to 2 variant rows; 1-row output."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    stats = (
        e.select(
            _variant(), F.round(F.col("value") * 100).cast("long").alias("v_c")
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v_c").alias("s"),
            F.sum(F.col("v_c") * F.col("v_c")).alias("ss"),
        )
    )
    derived = stats.select(
        "variant",
        "n",
        (F.col("s") / 100.0 / F.col("n")).alias("mean"),
        (
            (
                F.col("ss") / 10000.0
                - (F.col("s") / 100.0) * (F.col("s") / 100.0) / F.col("n")
            )
            / F.nullif(F.col("n") - 1, F.lit(0))
        ).alias("var"),
    )
    wide = derived.agg(
        *[
            F.max(F.when(F.col("variant") == v, F.col(c))).alias(
                f"{c}_{v.lower()}"
            )
            for c in ("n", "mean", "var")
            for v in ("A", "B")
        ]
    )
    delta = F.col("mean_a") - F.col("mean_b")
    v = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    tau2 = F.lit(_MSPRT_TAU2)
    lam = F.sqrt(v / (v + tau2)) * F.exp(
        delta * delta * tau2 / (2.0 * v * (v + tau2))
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round(delta, 6).alias("delta"),
        F.round(lam, 6).alias("likelihood_ratio"),
        F.round(F.least(F.lit(1.0), 1.0 / lam), 6).alias("p_always_valid"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily revenue series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@query(
    "daily_acf",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
               AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY d
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(y) AS s, sum(y * y) AS ss
      FROM daily
    ),
    lagk AS (
      SELECT l.lag, d.y AS y0,
             lead(d.y, CAST(l.lag AS INT))
               OVER (PARTITION BY l.lag ORDER BY d.d) AS yk
      FROM daily d CROSS JOIN
           (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag) l
    ),
    num AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             sum(y0 * yk) AS sxy, sum(y0) AS sy0, sum(yk) AS syk
      FROM lagk WHERE yk IS NOT NULL GROUP BY lag
    )
    SELECT CAST(num.lag AS INT) AS lag, num.n_pairs,
           round((sxy - (s * 1.0 / n) * sy0 - (s * 1.0 / n) * syk
                  + n_pairs * (s * 1.0 / n) * (s * 1.0 / n))
                 / nullif(ss - s * 1.0 * s / n, 0), 6) AS acf
    FROM num CROSS JOIN mom
    ORDER BY lag
    """,
)
def daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..7 — the
    seasonality/momentum fingerprint read before fitting any forecast
    (Box & Jenkins, public method). Standard ACF estimator with the
    GLOBAL mean and variance: r_k = sum_(t<=n-k) (y_t - ybar)
    (y_(t+k) - ybar) / sum (y_t - ybar)^2, expanded algebraically to
    sxy - ybar*sy0 - ybar*syk + n_k*ybar^2 so every input is an
    EXACT integer moment (sxy, sy0, syk, s, ss are BIGINT sums of
    integer-cents daily totals) and both engines run identical scalar
    algebra. Lag pairs use lead() over the observed series in both
    engines, so a missing day contributes no spurious zero.

    Scale: one map-side-combinable aggregate to the bounded daily
    table, a {_ACF_MAX_LAG}x broadcast replicate of THAT table
    (365 x {_ACF_MAX_LAG} rows/year at any event volume), per-lag
    lead windows over it, one keyed reduce."""
    e = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("y")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    wlag = Window.partitionBy("lag").orderBy("d")
    # lead() needs a literal offset: evaluate one lead per lag value
    # over the (daily x lags) replicate and pick the matching one —
    # all windows share the single tiny partition-by-lag sort
    lead_k = F.coalesce(
        *[
            F.when(F.col("lag") == k, F.lead("y", k).over(wlag))
            for k in range(1, _ACF_MAX_LAG + 1)
        ]
    )
    lagk = daily.crossJoin(F.broadcast(lags)).select(
        "lag", F.col("y").alias("y0"), lead_k.alias("yk")
    )
    num = (
        lagk.where(F.col("yk").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("y0") * F.col("yk")).alias("sxy"),
            F.sum("y0").alias("sy0"),
            F.sum("yk").alias("syk"),
        )
    )
    ybar = F.col("s") * 1.0 / F.col("n")
    denom = F.nullif(
        F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n"), F.lit(0.0)
    )
    return (
        num.crossJoin(F.broadcast(mom))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.round(
                (
                    F.col("sxy")
                    - ybar * F.col("sy0")
                    - ybar * F.col("syk")
                    + F.col("n_pairs") * ybar * ybar
                )
                / denom,
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )

# ---------------------------------------------------------------------------
# Split-conformal prediction interval with held-out coverage audit
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1  # target 90% coverage


@query(
    "conformal_interval_report",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v_c,
             {portable_id_hash_duck("CAST(event_id AS VARCHAR)")} % 4
               AS fold
      FROM events WHERE value IS NOT NULL
    ),
    model AS (
      SELECT event_type, sum(v_c) AS s, CAST(count(*) AS BIGINT) AS n
      FROM base WHERE fold <= 1 GROUP BY event_type
    ),
    resid AS (
      SELECT b.fold, abs(b.v_c - m.s * 1.0 / m.n) AS r
      FROM base b JOIN model m USING (event_type)
      WHERE b.fold >= 2
    ),
    calib AS (
      SELECT r, CAST(count(*) AS BIGINT) AS c FROM resid
      WHERE fold = 2 GROUP BY r
    ),
    ktab AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_calib,
             CAST(ceil((sum(c) + 1) * (1.0 - {_CONF_ALPHA})) AS BIGINT)
               AS k
      FROM calib
    ),
    q AS (
      SELECT min(r) AS q_cents FROM (
        SELECT r, sum(c) OVER (ORDER BY r
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM calib
      ) CROSS JOIN ktab WHERE cum >= k
    ),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN r <= q.q_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS covered
      FROM resid CROSS JOIN q WHERE fold = 3
    )
    SELECT k.n_calib, t.n_test,
           round(q.q_cents / 100.0, 4) AS interval_halfwidth,
           round(t.covered * 1.0 / t.n_test, 6) AS test_coverage,
           {1.0 - _CONF_ALPHA} AS target_coverage
    FROM ktab k CROSS JOIN q CROSS JOIN test t
    """,
)
def conformal_interval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al.; Lei et al.
    JASA'18 form, public method) with a held-out coverage audit — the
    distribution-free uncertainty wrapper a scoring pipeline puts
    around ANY point predictor: fit on folds 0-1 (here a per-
    event-type mean, the substitution point for a real model), take
    the k-th smallest absolute calibration residual with k =
    ceil((n_calib+1)*(1-alpha)) on fold 2, and report the interval
    half-width plus the EMPIRICAL coverage on untouched fold 3 —
    which conformal theory guarantees >= {1 - _CONF_ALPHA} in
    expectation.

    Determinism: folds are portable-hash; residuals are exact
    rationals |cents - s/n| evaluated identically; the order
    statistic comes from per-residual-value counts + one cumulative
    window over the distinct-residual table (the mann_whitney_u
    stance — never a row-level global sort), so k-th-smallest is an
    exact table lookup in both engines.

    Scale: one scan feeding three fold-filtered aggregates; the only
    window runs over the distinct-residual-value table (bounded by
    the cents x event-type domain)."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
        F.pmod(portable_id_hash("event_id"), F.lit(4)).alias("fold"),
    )
    # r14: every bounded intermediate below is consumed twice (model by
    # both resid branches, calib by ktab+q, ktab by q+output, q by
    # test+output) — unpinned, the final plan re-derived them all the
    # way from the events scan 12x over (24 scans). Lazy checkpoints on
    # the SMALL tables only (type-/cents-bounded; never the event-scale
    # residuals) pin one execution each: 3 scans total (guide §3.3).
    model = (
        base.where(F.col("fold") <= 1)
        .groupBy("event_type")
        .agg(
            F.sum("v_c").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    resid = (
        base.where(F.col("fold") >= 2)
        .join(F.broadcast(model), "event_type")
        .select(
            "fold",
            F.abs(F.col("v_c") - F.col("s") * 1.0 / F.col("n")).alias("r"),
        )
    )
    calib = (
        resid.where(F.col("fold") == 2)
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    ktab = calib.agg(
        F.sum("c").cast("long").alias("n_calib"),
        F.ceil((F.sum("c") + 1) * (1.0 - _CONF_ALPHA))
        .cast("long")
        .alias("k"),
    ).localCheckpoint(eager=False)
    wcum = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = (
        calib.select("r", F.sum("c").over(wcum).alias("cum"))
        .crossJoin(F.broadcast(ktab))
        .where(F.col("cum") >= F.col("k"))
        .agg(F.min("r").alias("q_cents"))
        .localCheckpoint(eager=False)
    )
    test = (
        resid.where(F.col("fold") == 3)
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q_cents"), 1).otherwise(0))
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        ktab.select("n_calib")
        .crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(test))
        .select(
            "n_calib",
            "n_test",
            F.round(F.col("q_cents") / 100.0, 4).alias("interval_halfwidth"),
            F.round(F.col("covered") * 1.0 / F.col("n_test"), 6).alias(
                "test_coverage"
            ),
            F.lit(1.0 - _CONF_ALPHA).alias("target_coverage"),
        )
    )

# ---------------------------------------------------------------------------
# Quantile treatment effects (distributional A/B readout)
# ---------------------------------------------------------------------------


@query(
    "quantile_treatment_effects",
    oracle=f"""
    WITH assign AS (
      SELECT {_SQL_VARIANT} AS variant, value, event_id
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT variant, value,
             ntile(10) OVER (PARTITION BY variant
                             ORDER BY value, event_id) AS decile
      FROM assign
    ),
    bounds AS (
      SELECT variant, decile, max(value) AS q,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY variant, decile
    )
    SELECT a.decile,
           a.n AS n_a, b.n AS n_b,
           round(a.q, 2) AS q_a, round(b.q, 2) AS q_b,
           round(a.q - b.q, 2) AS qte
    FROM bounds a JOIN bounds b
      ON a.decile = b.decile AND a.variant = 'A' AND b.variant = 'B'
    ORDER BY a.decile
    """,
)
def quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — the DISTRIBUTIONAL A/B readout
    (Koenker & Bassett quantile framing, public): the per-decile
    boundary difference q_A(tau) - q_B(tau) between experiment arms,
    which catches effects the mean hides (a treatment that lifts the
    tail while thinning the middle nets to zero in ab_test_welch but
    shows a signed QTE profile here).

    Boundaries come from ntile over the deterministic (value,
    event_id) total order — the value_deciles stance: even when a tie
    straddles a bucket edge, the boundary max is the tie VALUE, so
    the emitted quantiles are engine-stable. Exact-oracle baseline;
    the at-scale path swaps in sampled cut points exactly as
    value_deciles_approx demonstrates.

    Scale: one scan, one per-variant sort window (bounded by the
    larger arm at test SF; see above), a 10x2-row bounds table, and a
    broadcast-sized decile join."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    assign = e.select(_variant(), "value", "event_id")
    w = Window.partitionBy("variant").orderBy("value", "event_id")
    d = assign.select(
        "variant", "value", F.ntile(10).over(w).alias("decile")
    )
    bounds = d.groupBy("variant", "decile").agg(
        F.max("value").alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = bounds.where(F.col("variant") == "A").alias("a")
    b = bounds.where(F.col("variant") == "B").alias("b")
    return (
        a.join(b, F.col("a.decile") == F.col("b.decile"))
        .select(
            F.col("a.decile").alias("decile"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(F.col("a.q"), 2).alias("q_a"),
            F.round(F.col("b.q"), 2).alias("q_b"),
            F.round(F.col("a.q") - F.col("b.q"), 2).alias("qte"),
        )
        .orderBy("decile")
    )

# ---------------------------------------------------------------------------
# Count-model overdispersion diagnostic
# ---------------------------------------------------------------------------


@query(
    "user_event_overdispersion",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(k) AS s, sum(k * k) AS ss
      FROM per_user
    )
    SELECT n AS n_users,
           round(s * 1.0 / n, 6) AS mean_events,
           round((ss - s * 1.0 * s / n) / nullif(n - 1, 0), 6)
             AS var_events,
           round(((ss - s * 1.0 * s / n) / nullif(n - 1, 0))
                 / nullif(s * 1.0 / n, 0), 6) AS dispersion_index,
           round(((ss - s * 1.0 * s / n) / (s * 1.0 / n) - (n - 1))
                 / sqrt(2.0 * (n - 1)), 4) AS poisson_z
    FROM mom
    """,
)
def user_event_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnostic for per-user event counts — the
    check run before choosing Poisson vs negative-binomial for any
    count model (rate limiting, LTV, anomaly thresholds): the
    variance/mean dispersion index (1 under Poisson) and the
    standardized dispersion statistic ((n-1)*D - (n-1)) / sqrt(2(n-1))
    from the chi-square approximation of sum (k - kbar)^2 / kbar
    (Fisher's dispersion test, public). Index >> 1 means bursty/
    heavy-tailed users — Poisson thresholds would over-alarm.

    Determinism: per-user counts are exact integers; n, sum k,
    sum k^2 are exact BIGINTs; both statistics are fixed scalar
    algebra over them.

    Scale: one map-side-combinable aggregate to users, one 1-row
    reduce. Nothing else."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").alias("s"),
        F.sum(F.col("k") * F.col("k")).alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    mean = s * 1.0 / n
    var = (ss - s * 1.0 * s / n) / F.nullif(n - 1, F.lit(0))
    disp = var / F.nullif(mean, F.lit(0.0))
    chi = (ss - s * 1.0 * s / n) / mean  # = (n-1) * D
    return mom.select(
        n.alias("n_users"),
        F.round(mean, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(disp, 6).alias("dispersion_index"),
        F.round((chi - (n - 1)) / F.sqrt(2.0 * (n - 1)), 4).alias(
            "poisson_z"
        ),
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha (multi-rater agreement with missing ratings)
# ---------------------------------------------------------------------------
#
# The annotation-QA readout for a labeling campaign with >2 raters and
# incomplete coverage — the regime Cohen's kappa (see
# classifier_agreement_kappa) cannot handle. Nominal-data alpha
# (Krippendorff 2004, public method): alpha = 1 - D_o / D_e with
# D_o the within-unit pairwise disagreement rate and D_e the
# disagreement expected from the pooled label marginals.
#
# Synthetic annotations: 3 deterministic hash-raters label each
# document against a latent hash-truth with rater-specific noise;
# rater 3 skips a fifth of the units, so the pairable-unit filter and
# the m_u=2 vs m_u=3 weighting are both exercised.

_KRIPP_LABELS = ("pos", "neg", "neu")
_KRIPP_RATERS = 3


def _kripp_label(rater: int) -> Column:
    doc = F.col("doc_id").cast("string")
    true_ix = F.pmod(portable_id_hash(F.concat(F.lit("true"), doc)), 3)
    flip = (
        F.pmod(portable_id_hash(F.concat(F.lit(f"flip{rater}"), doc)), 10)
        < 1 + rater
    )
    alt = F.pmod(portable_id_hash(F.concat(F.lit(f"alt{rater}"), doc)), 2)
    ix = F.when(flip, F.pmod(true_ix + 1 + alt, 3)).otherwise(true_ix)
    return F.element_at(
        F.array(*[F.lit(x) for x in _KRIPP_LABELS]), ix.cast("int") + 1
    )


def _sql_kripp_label(rater: int) -> str:
    doc = "CAST(doc_id AS VARCHAR)"
    h_true = portable_id_hash_duck(f"'true' || {doc}")
    h_flip = portable_id_hash_duck(f"'flip{rater}' || {doc}")
    h_alt = portable_id_hash_duck(f"'alt{rater}' || {doc}")
    true_ix = f"({h_true} % 3)"
    flip = f"({h_flip} % 10) < {1 + rater}"
    alt = f"({h_alt} % 2)"
    ix = (
        f"CASE WHEN {flip} THEN ({true_ix} + 1 + {alt}) % 3 "
        f"ELSE {true_ix} END"
    )
    return f"(list_value{_KRIPP_LABELS!r}[CAST({ix} AS INT) + 1])"


@query(
    "krippendorff_alpha",
    oracle=f"""
    WITH ratings AS (
      SELECT doc_id, 1 AS rater, {_sql_kripp_label(1)} AS label
      FROM documents
      UNION ALL
      SELECT doc_id, 2, {_sql_kripp_label(2)} FROM documents
      UNION ALL
      SELECT doc_id, 3, {_sql_kripp_label(3)} FROM documents
      WHERE {portable_id_hash_duck("'miss' || CAST(doc_id AS VARCHAR)")}
            % 5 <> 0
    ),
    cell AS (
      SELECT doc_id, label, CAST(count(*) AS BIGINT) AS n_uc
      FROM ratings GROUP BY doc_id, label
    ),
    unit AS (
      SELECT doc_id, CAST(sum(n_uc) AS BIGINT) AS m,
             CAST(sum(n_uc * n_uc) AS BIGINT) AS ssq
      FROM cell GROUP BY doc_id
    ),
    pairable AS (SELECT * FROM unit WHERE m >= 2),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(m) AS BIGINT) AS n,
             CAST(sum(CASE WHEN m = 2 THEN 2 * (4 - ssq)
                           ELSE 9 - ssq END) AS BIGINT) AS sum_u2
      FROM pairable
    ),
    marg AS (
      SELECT CAST(sum(n_uc * n_uc) AS BIGINT) AS sum_nc2
      FROM (
        SELECT c.label, CAST(sum(c.n_uc) AS BIGINT) AS n_uc
        FROM cell c JOIN pairable p USING (doc_id)
        GROUP BY c.label
      )
    )
    SELECT f.n_units, f.n,
           round(f.sum_u2 / 2.0 / f.n, 6) AS d_observed,
           round((f.n * f.n - m.sum_nc2) * 1.0
                 / (f.n * (f.n - 1)), 6) AS d_expected,
           round(1.0 - (f.sum_u2 * (f.n - 1)) * 1.0
                       / (2.0 * (f.n * f.n - m.sum_nc2)), 6) AS alpha
    FROM folded f CROSS JOIN marg m
    """,
)
def krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha for nominal labels, 3 raters, missing
    ratings allowed — the chance-corrected agreement coefficient a
    labeling campaign reports when Cohen's kappa's two-complete-raters
    assumption fails. alpha = 1 - D_o/D_e over pairable units
    (m_u >= 2 ratings).

    Determinism/exactness: every D term reduces to exact BIGINT
    algebra — per-unit pairwise disagreement (m^2 - sum_c n_uc^2)
    carries the 1/(m-1) weight as integers (m in {{2,3}} makes
    2*(m^2-ssq)/(m-1) integral by case analysis), and D_e comes from
    the squared pooled marginals; ONE float division at the end,
    mirrored.

    Scale: explode 3 ratings per doc -> (doc, label) keyed aggregate
    -> doc-keyed unit table -> 1-row fold + label-domain marginals.
    All map-side combinable; no windows."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    miss = (
        F.pmod(
            portable_id_hash(
                F.concat(F.lit("miss"), F.col("doc_id").cast("string"))
            ),
            5,
        )
        != 0
    )
    parts = [
        docs.select(
            "doc_id",
            F.lit(r).alias("rater"),
            _kripp_label(r).alias("label"),
        )
        for r in (1, 2)
    ] + [
        docs.filter(miss).select(
            "doc_id", F.lit(3).alias("rater"), _kripp_label(3).alias("label")
        )
    ]
    ratings = parts[0].unionByName(parts[1]).unionByName(parts[2])
    # r14: cell feeds unit AND the marginals join; pairable feeds the
    # fold AND the marginals semi-filter — unpinned, the 3-way ratings
    # union re-scanned documents 18x per action. Narrow keyed counts,
    # one execution each (guide §3.3).
    cell = ratings.groupBy("doc_id", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n_uc")
    ).localCheckpoint(eager=False)
    unit = cell.groupBy("doc_id").agg(
        F.sum("n_uc").cast("long").alias("m"),
        F.sum(F.col("n_uc") * F.col("n_uc")).cast("long").alias("ssq"),
    )
    pairable = unit.filter(F.col("m") >= 2).localCheckpoint(eager=False)
    folded = pairable.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("m").cast("long").alias("n"),
        F.sum(
            F.when(F.col("m") == 2, 2 * (4 - F.col("ssq"))).otherwise(
                9 - F.col("ssq")
            )
        )
        .cast("long")
        .alias("sum_u2"),
    )
    marg = (
        cell.join(pairable.select("doc_id"), "doc_id")
        .groupBy("label")
        .agg(F.sum("n_uc").cast("long").alias("n_c"))
        .agg(
            F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("sum_nc2")
        )
    )
    return folded.crossJoin(F.broadcast(marg)).select(
        "n_units",
        "n",
        F.round(F.col("sum_u2") / 2.0 / F.col("n"), 6).alias("d_observed"),
        F.round(
            (F.col("n") * F.col("n") - F.col("sum_nc2"))
            * 1.0
            / (F.col("n") * (F.col("n") - 1)),
            6,
        ).alias("d_expected"),
        F.round(
            1.0
            - (F.col("sum_u2") * (F.col("n") - 1))
            * 1.0
            / (2.0 * (F.col("n") * F.col("n") - F.col("sum_nc2"))),
            6,
        ).alias("alpha"),
    )
