"""Behavioral tests (planted positives/negatives) for the round-7
survival-analysis and graph additions: Kaplan-Meier time-to-purchase,
bounded Bellman-Ford shortest paths, degree-ordered triangle counts,
and temperature-based mixture weights."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from clickstreamtoclickhouse_spark import plans

from .conftest import SF_DIR


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{table}.parquet")


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(user, hours, etype, eid):
    return (eid, T0 + dt.timedelta(hours=hours), user, etype)


EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def test_km_planted_life_table(spark, tmp_path):
    """4 planted users: purchases at +1h and +2h, one late purchase
    beyond the 96h horizon (censored at 96), one never-purchaser
    (censored at 96) -> the textbook product-limit values."""
    rows = [
        _ev(1, 0, "view", 1), _ev(1, 1, "purchase", 2),
        _ev(2, 0, "view", 3), _ev(2, 2, "purchase", 4),
        # u3 purchases at +200h: beyond the horizon -> censored at 96
        _ev(3, 0, "view", 5), _ev(3, 200, "purchase", 6),
        # u4 never purchases; max ts (+200h) keeps everyone's
        # end-of-observation beyond the 96h horizon
        _ev(4, 0, "view", 7),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.t_hours: r
        for r in plans.QUERIES["km_time_to_purchase"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2, 96}
    assert (out[1].n_at_risk, out[1].n_events, out[1].n_censored) == (4, 1, 0)
    assert out[1].survival == round(3 / 4, 6)
    assert (out[2].n_at_risk, out[2].n_events, out[2].n_censored) == (3, 1, 0)
    assert out[2].survival == round(3 / 4 * 2 / 3, 6)
    # the two censored subjects exit at the horizon; S(t) unchanged
    assert (out[96].n_at_risk, out[96].n_events, out[96].n_censored) == (
        2, 0, 2,
    )
    assert out[96].survival == out[2].survival


def test_km_risk_set_exhausted_yields_zero(spark, tmp_path):
    """If the last subjects at risk all convert at time t, S(t) must
    be exactly 0.0 (not ln(0) blow-up)."""
    rows = [
        _ev(1, 0, "view", 1), _ev(1, 1, "purchase", 2),
        _ev(2, 0, "view", 3), _ev(2, 1, "purchase", 4),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = plans.QUERIES["km_time_to_purchase"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].t_hours == 1 and out[0].survival == 0.0


def test_shortest_paths_planted_graph(spark, tmp_path):
    """Planted chain A->B->C: source is the dominant type A; costs are
    the -ln transition probabilities along the most likely path."""
    rows = [
        # user 1: A A A B  (A->A x2, A->B)
        _ev(1, 0, "A", 1), _ev(1, 1, "A", 2),
        _ev(1, 2, "A", 3), _ev(1, 3, "B", 4),
        # user 2: A B C  (A->B, B->C)
        _ev(2, 0, "A", 5), _ev(2, 1, "B", 6), _ev(2, 2, "C", 7),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.event_type: r.min_cost
        for r in plans.QUERIES["transition_shortest_paths"](
            spark, str(tmp_path)
        ).collect()
    }
    # A: 5 occurrences -> source. P(A->B)=2/4, P(B->C)=1/1.
    assert out["A"] == 0.0
    assert out["B"] == round(round(-math.log(0.5), 9), 6)
    assert out["C"] == out["B"]  # the B->C hop has probability 1 (cost 0)


def test_shortest_paths_unreachable_absent(spark, tmp_path):
    """A node with no inbound path from the source must not appear."""
    rows = [
        # Z is its own island (Z->Z); A dominates and never reaches Z
        _ev(1, 0, "A", 1), _ev(1, 1, "B", 2),
        _ev(2, 0, "A", 3), _ev(2, 1, "B", 4),
        _ev(3, 0, "Z", 5), _ev(3, 1, "Z", 6),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.event_type
        for r in plans.QUERIES["transition_shortest_paths"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"A", "B"}


LI_SCHEMA = "l_orderkey long, l_partkey long"


def test_triangles_planted(spark, tmp_path):
    """Order {1,2,3} forms one triangle; order {3,4} adds an edge that
    closes nothing; duplicate lines must not double-count."""
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 3), (2, 4),
        (3, 1), (3, 2), (3, 2),  # duplicate line: edge (1,2) again
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = {
        r.l_partkey: r.n_triangles
        for r in plans.QUERIES["part_copurchase_triangles"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangles_two_shared_edge(spark, tmp_path):
    """Two triangles sharing edge (2,3): corner counts reflect
    participation, each triangle counted exactly once."""
    rows = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (2, 4)]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = {
        r.l_partkey: r.n_triangles
        for r in plans.QUERIES["part_copurchase_triangles"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def test_temperature_weights_upsample_minority(spark, tmp_path):
    """90/10 token split at alpha=0.3: weights sum to 1, the minority
    language is upsampled (>1x), the majority damped (<1x)."""
    ten_words = "a b c d e f g h i j"
    rows = [(i, ten_words, "en", "s") for i in range(9)]
    rows.append((99, ten_words, "de", "s"))
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.lang: r
        for r in plans.QUERIES["temperature_sampling_weights"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["en"].n_tokens == 90 and out["de"].n_tokens == 10
    assert abs(out["en"].weight + out["de"].weight - 1.0) < 1e-6
    z = 0.9**0.3 + 0.1**0.3
    assert abs(out["de"].weight - 0.1**0.3 / z) < 1e-6
    assert out["de"].upsample_factor > 1.0 > out["en"].upsample_factor


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: containment 1.0 in
    the short->long direction while Jaccard stays below threshold;
    unrelated docs emit nothing."""
    from clickstreamtoclickhouse_spark.functions import dedup_text

    long_words = " ".join(f"w{i}" for i in range(30))
    short_words = " ".join(f"w{i}" for i in range(10))
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long_words), (2, short_words), (3, other)],
        "doc_id long, text string",
    )
    pairs = dedup_text.containment_pairs(docs, threshold=0.9, n=3).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.cont_b_in_a == 1.0  # every shingle of the short doc is in the long
    assert r.cont_a_in_b < 0.5
    # symmetric jaccard misses this pair at the same bar
    jac = dedup_text.jaccard_pairs(docs, threshold=0.9, n=3).collect()
    assert jac == []


def test_k_core_peels_tail_keeps_clique(spark):
    """Clique of 4 (degree 3) + pendant chain: at k=3 the chain
    cascades away, the clique survives with in-core degree 3."""
    from clickstreamtoclickhouse_spark.functions.graph import k_core

    clique = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame(clique + chain, "a long, b long")
    core = {r.node: r.core_degree for r in k_core(edges, k=3).collect()}
    assert core == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_cascade_to_empty(spark):
    """A pure path has no 2-core: synchronous peeling must cascade
    from the endpoints until nothing is left."""
    from clickstreamtoclickhouse_spark.functions.graph import k_core

    path = [(i, i + 1) for i in range(1, 8)]
    edges = spark.createDataFrame(path, "a long, b long")
    assert k_core(edges, k=2).count() == 0


def test_bootstrap_ci_constant_value_degenerate(spark, tmp_path):
    """With every purchase worth the same amount, every replicate mean
    equals the point mean, so the CI collapses to a point."""
    rows = [
        (i, T0 + dt.timedelta(hours=i), i % 7, "purchase") for i in range(60)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    # the query reads `value`: rewrite with a constant value column
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{tmp_path}/events.parquet").withColumn(
        "value", F.lit(12.34)
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events2.parquet")
    spark.read.parquet(f"{tmp_path}/events2.parquet").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    out = plans.QUERIES["purchase_mean_bootstrap_ci"](
        spark, str(tmp_path)
    ).collect()[0]
    assert out.n_replicates == 200
    assert out.point_mean == 12.34
    assert out.ci_lo == 12.34 and out.ci_hi == 12.34


def test_bootstrap_ci_brackets_point_mean(spark):
    out = plans.QUERIES["purchase_mean_bootstrap_ci"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert out.n_replicates == 200
    assert out.ci_lo <= out.point_mean <= out.ci_hi
    assert out.ci_lo < out.ci_hi


def test_holt_tracks_linear_ramp(spark, tmp_path):
    """On a pure linear ramp the Holt trend converges toward the true
    slope and one-step forecasts stay far closer than EWMA's lag."""
    rows = []
    eid = 0
    for day in range(12):
        eid += 1
        rows.append((eid, T0 + dt.timedelta(days=day), 1, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{tmp_path}/events.parquet").withColumn(
        "value", (F.dayofmonth("ts") * 10.0).cast("double")
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events2.parquet")
    spark.read.parquet(f"{tmp_path}/events2.parquet").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    out = sorted(
        plans.QUERIES["daily_value_holt"](spark, str(tmp_path)).collect(),
        key=lambda r: r.d,
    )
    assert out[0].forecast is None and out[0].residual is None
    # true slope is 10/day: the trend estimate must be positive and
    # approaching it, and late forecasts must be within a few units
    assert out[-1].trend > 5.0
    assert abs(out[-1].residual) < abs(out[1].residual) or out[1].residual is None
    assert abs(out[-1].actual - out[-1].forecast) < 15.0


def test_span_corruption_roundtrip_and_rate(spark):
    """Denoising-pair invariant: splicing each <extra_id_K> target
    span back into the input reconstructs the original token stream;
    aggregate mask rate sits near the 15% design point."""
    import re

    rows = plans.QUERIES["span_corruption_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = {
        r.doc_id: r.text
        for r in plans.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert rows
    tot_tokens = sum(r.n_tokens for r in rows)
    tot_masked = sum(r.n_masked for r in rows)
    assert 0.08 <= tot_masked / tot_tokens <= 0.25
    sent = re.compile(r"^<extra_id_(\d+)>$")
    for r in rows:
        # parse targets into span lists keyed by sentinel id
        spans, cur = {}, None
        for tok in r.targets_text.split():
            m = sent.match(tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tok)
        assert r.n_spans == len(spans)
        assert all(spans[k] for k in spans), f"empty span in doc {r.doc_id}"
        rebuilt = []
        for tok in r.input_text.split():
            m = sent.match(tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == docs[r.doc_id].split(), f"doc {r.doc_id}"


def test_dtw_shift_tolerance(spark, tmp_path):
    """A one-day-shifted spike aligns at distance 0 under DTW (the
    property cosine/euclidean lack); a flat series stays far."""
    rows, eid = [], 0
    # X: spike of 5 events on day 1; Y: same spike on day 2;
    # Z: one event on each of days 0..3 (anchors the calendar too)
    for _ in range(5):
        eid += 1; rows.append(_ev(1, 24 * 1, "X", eid))
    for _ in range(5):
        eid += 1; rows.append(_ev(2, 24 * 2, "Y", eid))
    for day in range(4):
        eid += 1; rows.append(_ev(3, 24 * day, "Z", eid))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        (r.type_a, r.type_b): r.dtw_distance
        for r in plans.QUERIES["event_type_dtw"](spark, str(tmp_path)).collect()
    }
    # vectors over days 0..3: X=[0,5,0,0], Y=[0,0,5,0], Z=[1,1,1,1]
    assert out[("X", "Y")] == 0  # warping absorbs the one-day shift
    def dtw(a, b):
        INF = 10**15
        old = [0] + [INF] * len(b)
        for x in a:
            nr = [INF]
            for j in range(1, len(b) + 1):
                nr.append(abs(x - b[j - 1]) + min(old[j], old[j - 1], nr[j - 1]))
            old = nr
        return old[len(b)]
    assert out[("X", "Z")] == dtw([0, 5, 0, 0], [1, 1, 1, 1])
    assert out[("Y", "Z")] == dtw([0, 0, 5, 0], [1, 1, 1, 1])
    assert out[("X", "Z")] > out[("X", "Y")]


def test_eb_shrinkage_pulls_low_n_toward_mean(spark, tmp_path):
    """A 1-event user at 100% shrinks hard toward the population
    mean; a 100-event user barely moves — the defining EB property."""
    rows, eid = [], 0
    # 8 users with 50 events each at 20% purchase rate (population)
    for u in range(8):
        for i in range(50):
            eid += 1
            rows.append(
                _ev(u, i, "purchase" if i % 5 == 0 else "view", eid)
            )
    # user 100: a single purchase (raw rate 1.0)
    eid += 1
    rows.append(_ev(100, 0, "purchase", eid))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.user_id: r
        for r in plans.QUERIES["smoothed_conversion_rates"](
            spark, str(tmp_path)
        ).collect()
    }
    one_shot = out[100]
    assert one_shot.raw_rate == 1.0
    # shrunk most of the way back toward ~0.2
    assert one_shot.smoothed_rate < 0.65
    big = out[0]
    assert abs(big.smoothed_rate - big.raw_rate) < 0.05
    # every smoothed rate sits between the raw rate and the pop mean
    rates = [r.raw_rate for r in out.values()]
    m = sum(rates) / len(rates)
    for r in out.values():
        lo, hi = sorted((r.raw_rate, m))
        assert lo - 1e-6 <= r.smoothed_rate <= hi + 1e-6


def test_gini_equal_vs_whale(spark, tmp_path):
    """Equal contributors -> gini 0; one whale among zeros -> the
    rank-formula maximum (n-1)/n."""
    schema = EV_SCHEMA + ", value double"
    equal = [(i, T0, i, "view", 10.0) for i in range(1, 11)]
    _write(spark, tmp_path, "events", equal, schema)
    out = plans.QUERIES["user_value_gini"](spark, str(tmp_path)).collect()[0]
    assert out.n_users == 10 and out.gini == 0.0
    # whale: user 10 gets everything
    whale = [
        (i, T0, i, "view", 1000.0 if i == 10 else 0.0) for i in range(1, 11)
    ]
    _write(spark, tmp_path, "events", whale, schema)
    out = plans.QUERIES["user_value_gini"](spark, str(tmp_path)).collect()[0]
    assert out.gini == round((10 - 1) / 10, 6)


def test_mlm_alignment_and_policy(spark):
    """masked_text stays token-aligned with the original; labels
    carry the true tokens at their positions; the 80/10/10 policy
    shows up as a [MASK] majority among selected positions."""
    rows = plans.QUERIES["mlm_masked_tokens"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = {
        r.doc_id: r.text.split()
        for r in plans.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .collect()
    }
    tot = sum(r.n_tokens for r in rows)
    sel = sum(r.n_selected for r in rows)
    assert 0.10 <= sel / tot <= 0.20
    n_mask = 0
    for r in rows:
        orig = docs[r.doc_id]
        masked = r.masked_text.split()
        assert len(masked) == len(orig)
        labels = {}
        for item in (r.labels_text.split() if r.labels_text else []):
            p, tok = item.split(":", 1)
            labels[int(p)] = tok
        assert len(labels) == r.n_selected
        for p, tok in labels.items():
            assert orig[p - 1] == tok  # label = original token
        for j, (m, o) in enumerate(zip(masked, orig), start=1):
            if j not in labels:
                assert m == o  # unselected positions untouched
            elif m == "[MASK]":
                n_mask += 1
            else:
                assert m in orig  # random-replacement draws from the doc
    assert n_mask / sel > 0.6  # ~80% of selected become [MASK]


def test_km_survival_monotone_nonincreasing(spark):
    """S(t) is a survival function: non-increasing in t, within
    (0, 1], over real data."""
    rows = sorted(
        plans.QUERIES["km_time_to_purchase"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.t_hours,
    )
    assert rows
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9
        prev = r.survival
    # risk set is non-increasing too
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_dtw_identity_and_symmetry_properties(spark, tmp_path):
    """DTW(x, x) = 0; the pair table emits each unordered pair once
    (type_a < type_b), and distances are non-negative."""
    rows, eid = [], 0
    for day in range(5):
        for t in ("P", "Q"):
            eid += 1
            rows.append(_ev(1, 24 * day, t, eid))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = plans.QUERIES["event_type_dtw"](spark, str(tmp_path)).collect()
    assert len(out) == 1  # one unordered pair
    r = out[0]
    assert (r.type_a, r.type_b) == ("P", "Q")
    assert r.dtw_distance == 0  # identical series
    # real data: non-negativity over all pairs
    real = plans.QUERIES["event_type_dtw"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(x.dtw_distance >= 0 for x in real)
    assert len(real) == 10  # C(5,2) event-type pairs


def test_bootstrap_ci_width_shrinks_with_n(spark, tmp_path):
    """Percentile-bootstrap CI width scales ~1/sqrt(n): quadrupling
    the sample should clearly narrow the interval."""
    import random

    rng = random.Random(7)

    def mk(n):
        rows = []
        for i in range(n):
            rows.append(
                (i, T0 + dt.timedelta(minutes=i), i % 9, "purchase",
                 round(rng.uniform(5, 95), 2))
            )
        return rows

    schema = EV_SCHEMA + ", value double"
    _write(spark, tmp_path, "events", mk(80), schema)
    small = plans.QUERIES["purchase_mean_bootstrap_ci"](
        spark, str(tmp_path)
    ).collect()[0]
    _write(spark, tmp_path, "events", mk(1280), schema)
    big = plans.QUERIES["purchase_mean_bootstrap_ci"](
        spark, str(tmp_path)
    ).collect()[0]
    assert (big.ci_hi - big.ci_lo) < (small.ci_hi - small.ci_lo) / 2


def test_theil_sen_robust_to_outlier(spark, tmp_path):
    """A perfect slope-30 ramp with one wild outlier day: Theil-Sen
    recovers the true slope; an OLS fit would be dragged far off."""
    schema = EV_SCHEMA + ", value double"
    rows = []
    for day in range(11):
        v = 3000.0 if day == 5 else 30.0 * (day + 1)
        rows.append((day + 1, T0 + dt.timedelta(days=day), 1, "view", v))
    _write(spark, tmp_path, "events", rows, schema)
    out = plans.QUERIES["daily_trend_theil_sen"](
        spark, str(tmp_path)
    ).collect()[0]
    assert out.n_days == 11
    assert abs(out.slope - 30.0) < 1.0  # median of slopes ignores the spike


def test_countmin_one_sided_and_mergeable(spark):
    """CM estimates never undercount (one-sided error), and the
    sketch built on the union equals the sum of per-half sketches
    probed jointly (mergeability)."""
    rows = plans.QUERIES["countmin_user_counts"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.overestimate >= 0
        assert r.cm_estimate == r.n_true + r.overestimate
    # the guarantee that matters: most estimates are close (w >> heavy
    # user count here, so collisions are rare)
    exact = sum(1 for r in rows if r.overestimate == 0)
    assert exact >= len(rows) * 0.5


def test_ks_detects_planted_drift(spark, tmp_path):
    """Late-half values shifted +50: KS must reject; identical halves
    must not."""
    schema = EV_SCHEMA + ", value double"
    shifted, same, eid = [], [], 0
    for i in range(400):
        eid += 1
        early = i < 200
        base = 10.0 + (i % 20)
        shifted.append(
            (eid, T0 + dt.timedelta(hours=i), i % 9, "view",
             base if early else base + 50.0)
        )
        same.append((eid, T0 + dt.timedelta(hours=i), i % 9, "view", base))
    _write(spark, tmp_path, "events", shifted, schema)
    out = plans.QUERIES["value_ks_drift_test"](spark, str(tmp_path)).collect()[0]
    assert out.drifted == 1 and out.ks_d > 0.9
    _write(spark, tmp_path, "events", same, schema)
    out = plans.QUERIES["value_ks_drift_test"](spark, str(tmp_path)).collect()[0]
    assert out.drifted == 0 and out.ks_d < out.crit_05


def test_holt_winters_nails_pure_weekly_cycle(spark, tmp_path):
    """A perfectly periodic weekly series: the first-cycle init makes
    the seasonal state exact, so every one-step forecast from day 8
    on reproduces the actual value (residual 0)."""
    schema = EV_SCHEMA + ", value double"
    pattern = [100.0, 80.0, 90.0, 120.0, 150.0, 60.0, 70.0]
    rows = []
    for day in range(28):
        rows.append(
            (day + 1, T0 + dt.timedelta(days=day), 1, "view",
             pattern[day % 7])
        )
    _write(spark, tmp_path, "events", rows, schema)
    out = plans.QUERIES["daily_value_holt_winters"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 21  # days 8..28
    for r in out:
        assert abs(r.residual) < 1e-6, r
        assert abs(r.trend) < 1e-6


def test_link_prediction_planted(spark, tmp_path):
    """Parts 1 and 2 share neighbors 3 and 4 but never co-occur:
    they must surface as the top candidate with cn=2; existing edges
    are excluded; a rarer shared neighbor outweighs a hub in AA."""
    import math

    rows = [
        (1, 1), (1, 3),       # 1-3
        (2, 2), (2, 3),       # 2-3
        (3, 1), (3, 4),       # 1-4
        (4, 2), (4, 4),       # 2-4
        # make 4 a hub: extra neighbors 5,6
        (5, 4), (5, 5),
        (6, 4), (6, 6),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = plans.QUERIES["part_link_prediction"](spark, str(tmp_path)).collect()
    cands = {(r.part_a, r.part_b): r for r in out}
    assert (1, 2) in cands
    top = cands[(1, 2)]
    assert top.common_neighbors == 2
    # z=3 has degree 2, z=4 degree 4: AA = 1/ln2 + 1/ln4
    expected_aa = round(1 / math.log(2) + 1 / math.log(4), 6)
    assert abs(top.adamic_adar - expected_aa) < 1e-6
    # no existing edge may appear as a candidate
    edges = {(1, 3), (2, 3), (1, 4), (2, 4), (4, 5), (4, 6)}
    assert all((r.part_a, r.part_b) not in edges for r in out)


def test_link_prediction_wedge_budget(spark):
    """Round 13 (r12 verdict #1): the wedge-count BUDGET behind the
    shuffle-saturation claim, asserted exactly against data. The
    capped wedge self-join must emit exactly
    sum_z C(min(deg_z, CAP), 2) rows — per-node wedge volume freezes
    at C(CAP,2) once a hub's degree passes the cap, so total wedge
    (and hence candidate/shuffle) volume is bounded by
    |V| * C(CAP,2) and grows linearly in node count once hubs
    saturate. A cap regression (e.g. the filter moving after the
    self-join) breaks the equality immediately."""
    from clickstreamtoclickhouse_spark.plans.tpch import (
        _LP_NEIGHBOR_CAP,
        _link_prediction_stages,
    )

    stages = _link_prediction_stages(spark, SF_DIR)
    wedges = stages["wedges"].count()
    und = (
        stages["edges"]
        .select(F.col("u").alias("z"))
        .unionByName(stages["edges"].select(F.col("v").alias("z")))
    )
    capped_deg = und.groupBy("z").agg(
        F.least(F.count(F.lit(1)), F.lit(_LP_NEIGHBOR_CAP)).alias("c")
    )
    row = capped_deg.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("budget"),
        F.count(F.lit(1)).alias("nodes"),
    ).collect()[0]
    assert wedges == row["budget"], (wedges, row["budget"])
    assert wedges <= row["nodes"] * (
        _LP_NEIGHBOR_CAP * (_LP_NEIGHBOR_CAP - 1) // 2
    )


def test_nelson_aalen_consistent_with_km(spark):
    """H(t) and S(t) over the same subjects: exp(-H) ~ S (they agree
    to first order), H is non-decreasing, and both use identical risk
    sets at event times."""
    import math

    km = {
        r.t_hours: r
        for r in plans.QUERIES["km_time_to_purchase"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    na = {
        r.t_hours: r
        for r in plans.QUERIES["nelson_aalen_hazard"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert na  # event times exist
    prev = 0.0
    for t in sorted(na):
        assert na[t].cum_hazard >= prev - 1e-9
        prev = na[t].cum_hazard
        assert na[t].n_at_risk == km[t].n_at_risk
        assert na[t].n_events == km[t].n_events
        # Fleming-Harrington relation: exp(-H) >= KM S(t), close to it
        assert math.exp(-na[t].cum_hazard) >= km[t].survival - 1e-9


def test_wilson_ci_bounds_and_degenerates(spark, tmp_path):
    """Wilson stays inside [0,1] and gives a nonzero-width interval
    even at k=0 (where Wald collapses to [0,0])."""
    rows = [(i, T0 + dt.timedelta(hours=i), 1, "view") for i in range(20)]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = plans.QUERIES["purchase_rate_wilson_ci"](
        spark, str(tmp_path)
    ).collect()[0]
    assert out.k == 0 and out.rate == 0.0
    assert out.ci_lo == 0.0 and 0.0 < out.ci_hi < 0.2
    real = plans.QUERIES["purchase_rate_wilson_ci"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert 0.0 <= real.ci_lo <= real.rate <= real.ci_hi <= 1.0
