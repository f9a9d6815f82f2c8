"""Round-11 behavioral pins: user_value_gini_approx accuracy vs the
exact form, vocab_coverage_curve's bounded-window plan, and the
round-11 additions."""
from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from .conftest import SF_DIR_MED


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


_TS = datetime(2024, 1, 10, 12, 0, 0)


def test_gini_approx_tracks_exact_on_sf_data(spark):
    """Grouped (binned-Lorenz) Gini lower-bounds the exact Gini —
    the bins partition users into contiguous value ranges, and the
    trapezoid under the Lorenz curve's chord never exceeds the curve
    itself — and with 20 equal-frequency bins the bias is small."""
    from clickstreamtoclickhouse_spark import plans

    exact = plans.QUERIES["user_value_gini"](spark, SF_DIR_MED).collect()[0]
    approx = plans.QUERIES["user_value_gini_approx"](
        spark, SF_DIR_MED
    ).collect()[0]
    assert approx["n_users"] == exact["n_users"]
    assert approx["total_value"] == exact["total_value"]
    # lower bound (up to the 1e-9 term rounding) and tight
    assert approx["gini_approx"] <= exact["gini"] + 1e-4
    assert exact["gini"] - approx["gini_approx"] < 0.02, (
        exact["gini"],
        approx["gini_approx"],
    )


def test_gini_approx_planted_extremes(spark, tmp_path):
    """One whale carrying ~all value -> gini near 1; perfectly equal
    users -> gini 0 (both engines' formula sanity, not just parity)."""
    from clickstreamtoclickhouse_spark import plans

    # 400 users with value 0.01 each, one whale with 10_000.00
    rows = [
        (i, _TS, i, "click", 0.01, None) for i in range(400)
    ] + [(400, _TS, 400, "click", 10_000.0, None)]
    _write_events(spark, tmp_path, rows)
    whale = plans.QUERIES["user_value_gini_approx"](
        spark, str(tmp_path)
    ).collect()[0]
    assert whale["gini_approx"] > 0.9, whale

    # 401 users, identical value each
    rows = [(i, _TS, i, "click", 5.0, None) for i in range(401)]
    _write_events(spark, tmp_path, rows)
    equal = plans.QUERIES["user_value_gini_approx"](
        spark, str(tmp_path)
    ).collect()[0]
    assert abs(equal["gini_approx"]) < 0.01, equal


# -- verdict r10 #5: registry-wide session-cache eviction -------------


def test_session_cache_registry_storage_shrinks(spark, tmp_path):
    """Every SessionDFCache self-registers; a multi-sf_dir session's
    checkpoint STORAGE (not just the dict entries) must shrink after
    evict_session_caches(sf_dir) across ALL registered caches. This
    is the generalization of the r10 triangle two-layer pin — and the
    storage assertion is load-bearing: DataFrame.unpersist() alone
    does NOT free localCheckpoint blocks (measured), evict() has to
    release the LogicalRDD's backing RDD."""
    from clickstreamtoclickhouse_spark import plans  # noqa: F401 — registers caches
    from clickstreamtoclickhouse_spark import util

    caches = util._SESSION_CACHES
    names = {c.name for c in caches}
    assert {
        "copurchase_edges",
        "triangle_counts",
        "corpus_tf",
        "hashed_bow_index",
        "near_dup_shingles",
        "chain_assignments",
    } <= names, names

    # Assert on the EXACT checkpoint RDD ids of the entries this test
    # builds, never on global storage counts: the shared session
    # carries other tests' per-query eager localCheckpoints whose
    # Python DataFrames are garbage — the ContextCleaner unpersists
    # them asynchronously, so a global count can shrink mid-test by
    # unrelated amounts (observed: r12 suite flake, base drifted by 2).
    def storage_ids() -> set[int]:
        return {
            i.id()
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    def ckpt_rdd_id(df) -> int:
        plan = df._jdf.queryExecution().analyzed()
        assert plan.getClass().getSimpleName() == "LogicalRDD", plan
        return plan.rdd().id()

    for c in caches:
        c.clear()
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    ids = {d1: set(), d2: set()}
    for i, c in enumerate(caches):
        for d in (d1, d2):
            df = c.get_or_build(
                spark, d, lambda i=i: spark.range(5 + i).selectExpr(
                    "id", f"id * {i + 1} as x"
                )
            )
            df.count()  # materialize the checkpoint blocks
            ids[d].add(ckpt_rdd_id(df))
    assert all(len(c) == 2 for c in caches)
    assert len(ids[d1]) == len(ids[d2]) == len(caches)
    live = storage_ids()
    assert (ids[d1] | ids[d2]) <= live, (ids, live)
    # per-dir eviction releases EVERY cache's d1 entry and its storage
    n = util.evict_session_caches(d1)
    assert n == len(caches)
    assert all(len(c) == 1 for c in caches)
    live = storage_ids()
    assert ids[d1].isdisjoint(live), (ids[d1], live)
    assert ids[d2] <= live, (ids[d2], live)
    # evict-all drains the rest
    assert util.evict_session_caches() == len(caches)
    assert all(len(c) == 0 for c in caches)
    assert ids[d2].isdisjoint(storage_ids())


# -- round 11: robots longest-prefix policy + lexical diversity -------


def test_robots_policy_longest_prefix_semantics(spark):
    """Recompute every URL's decision in Python from the published
    precedence rule (longest matching prefix wins; '' default-allow)
    and the portable hash, then compare the per-domain aggregates —
    the full rule lattice, independently re-derived."""
    import hashlib

    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.plans.webprep import (
        _messy_url_corpus,
        canonicalize_url,
        registrable_domain,
    )
    from .conftest import SF_DIR

    def h(salt: str, key: str) -> int:
        return int(
            hashlib.md5((salt + key).encode()).hexdigest()[:8], 16
        )

    def decide(rd: str, path: str) -> str:
        if path.startswith("/p/12"):
            return "disallow" if h("r3", rd) % 2 == 0 else "allow"
        if path.startswith("/p/1"):
            return "allow" if h("r2", rd) % 2 == 0 else "disallow"
        if path.startswith("/p/"):
            return "disallow" if h("r1", rd) % 2 == 0 else "allow"
        return "allow"

    m = _messy_url_corpus(plans.load(spark, SF_DIR, "documents"))
    curl = canonicalize_url(F.col("url"))
    rows = m.select(
        F.regexp_extract(
            curl, r"^[a-z]+://[^/?#]+([^?#]*)", 1
        ).alias("path"),
        registrable_domain(curl).alias("rd"),
    ).collect()
    exp: dict[str, list[int]] = {}
    for r in rows:
        a = exp.setdefault(r.rd, [0, 0])
        a[0 if decide(r.rd, r.path) == "allow" else 1] += 1
    got = {
        r.registrable_domain: r
        for r in plans.QUERIES["robots_policy_filter"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(exp)
    for rd, (n_allow, n_dis) in exp.items():
        assert got[rd].n_allowed == n_allow, rd
        assert got[rd].n_disallowed == n_dis, rd
        assert got[rd].n_urls == n_allow + n_dis
    # precedence must actually bite somewhere: at least one domain has
    # BOTH decisions present (a blanket rule overridden by a longer one)
    assert any(r.n_allowed > 0 and r.n_disallowed > 0 for r in got.values())


def test_lexical_diversity_planted(spark, tmp_path):
    from clickstreamtoclickhouse_spark import plans

    docs = [
        # source a: one type, 8 tokens -> ttr 1/8, zero hapax
        (1, "x x x x", "en", "a", 7),
        (2, "x x x x", "en", "a", 7),
        # source b: all types hapax and single-doc
        (3, "p q r s", "en", "b", 7),
        (4, "t u v w", "en", "b", 7),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r.source: r
        for r in plans.QUERIES["lexical_diversity_report"](
            spark, str(tmp_path)
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n_tokens, a.n_types, a.n_hapax) == (8, 1, 0)
    assert a.ttr == 0.125 and a.hapax_share == 0.0
    assert a.single_doc_type_share == 0.0  # 'x' appears in both docs
    assert (b.n_tokens, b.n_types, b.n_hapax) == (8, 8, 8)
    assert b.ttr == 1.0 and b.hapax_share == 1.0
    assert b.single_doc_type_share == 1.0


def test_krippendorff_alpha_python_reference(spark):
    """Independent reference: rebuild the ratings in Python from the
    portable hash, compute nominal alpha with the textbook formula
    (coincidence-matrix form), and require agreement to 1e-6 — plus
    the planted structure: positive agreement well above chance."""
    import hashlib

    from clickstreamtoclickhouse_spark import plans
    from .conftest import SF_DIR

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    doc_ids = [
        r.doc_id
        for r in plans.load(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    ]
    labels = ["pos", "neg", "neu"]
    units: dict[int, list[str]] = {}
    for d in doc_ids:
        ds = str(d)
        true_ix = h("true" + ds) % 3
        for r in (1, 2, 3):
            if r == 3 and h("miss" + ds) % 5 == 0:
                continue
            if h(f"flip{r}" + ds) % 10 < 1 + r:
                ix = (true_ix + 1 + h(f"alt{r}" + ds) % 2) % 3
            else:
                ix = true_ix
            units.setdefault(d, []).append(labels[ix])
    pair = {u: ls for u, ls in units.items() if len(ls) >= 2}
    n = sum(len(ls) for ls in pair.values())
    # D_o = (1/n) sum_u sum_{c != k} n_uc n_uk / (m_u - 1)
    do = 0.0
    from collections import Counter

    for ls in pair.values():
        m = len(ls)
        cnt = Counter(ls)
        ssq = sum(v * v for v in cnt.values())
        do += (m * m - ssq) / (m - 1)
    do /= n
    marg = Counter(x for ls in pair.values() for x in ls)
    sum_nc2 = sum(v * v for v in marg.values())
    de = (n * n - sum_nc2) / (n * (n - 1))
    alpha_ref = 1 - do / de

    got = plans.QUERIES["krippendorff_alpha"](spark, SF_DIR).collect()[0]
    assert got.n_units == len(pair)
    assert got.n == n
    assert abs(got.alpha - alpha_ref) < 1e-6, (got.alpha, alpha_ref)
    assert abs(got.d_observed - do) < 1e-6
    assert abs(got.d_expected - de) < 1e-6
    # raters agree far above chance but below perfection (noise planted)
    assert 0.3 < got.alpha < 0.95


def test_code_detection_planted(spark, tmp_path):
    """A code document (symbol-heavy AND keyword-heavy) must trip the
    conjunctive flag; keyword-free symbol soup and symbol-free
    keyword mentions must NOT."""
    from clickstreamtoclickhouse_spark import plans

    code = (
        "def f(x): return [x]; "
        "class A { public static void main() { int i = 0; } }"
    )
    punct_prose = "wow!!! (really); [yes] = <no> {maybe}; ok then"
    kw_prose = (
        "the class will return after the import of new function ideas "
        "for the public while we wait if else fails"
    )
    docs = [
        (1, code, "en", "code", len(code)),
        (2, punct_prose, "en", "prose", len(punct_prose)),
        (3, kw_prose, "en", "prose", len(kw_prose)),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r.source: r
        for r in plans.QUERIES["code_detection_report"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["code"].n_codeish == 1
    assert out["prose"].n_codeish == 0


def test_graph_random_walks_valid_and_deterministic(spark):
    """Every hop must traverse a real (symmetrized) co-purchase edge,
    every seed gets exactly K walks, and a second invocation yields
    the identical corpus (hash-driven, no RNG)."""
    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.plans import tpch
    from .conftest import SF_DIR

    edges = {
        (r.u, r.v)
        for r in tpch._copurchase_edges(spark, SF_DIR).collect()
    }
    sym = edges | {(v, u) for (u, v) in edges}
    walks = plans.QUERIES["graph_random_walks"](spark, SF_DIR).collect()
    assert walks
    starts: dict[int, int] = {}
    for w in walks:
        nodes = [int(x) for x in w.path.split("->")]
        assert len(nodes) == tpch._WALK_L + 1
        assert nodes[0] == w.start_node and nodes[-1] == w.end_node
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in sym, (w.path, (a, b))
        starts[w.start_node] = starts.get(w.start_node, 0) + 1
    assert set(starts.values()) == {tpch._WALK_K}
    # reproducibility: identical corpus on a fresh invocation
    again = {
        (w.start_node, w.walk_id, w.path)
        for w in plans.QUERIES["graph_random_walks"](
            spark, SF_DIR
        ).collect()
    }
    assert again == {(w.start_node, w.walk_id, w.path) for w in walks}
    # walks actually branch: not every walk is a 2-cycle backtrack
    assert any(
        len(set(w.path.split("->"))) > 2 for w in walks
    )


def test_dedup_threshold_sweep_monotone(spark):
    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.plans.ext import _SWEEP_THRESHOLDS
    from .conftest import SF_DIR

    rows = sorted(
        plans.QUERIES["dedup_threshold_sweep"](spark, SF_DIR).collect(),
        key=lambda r: r.thr,
    )
    assert [r.thr for r in rows] == list(_SWEEP_THRESHOLDS)
    assert rows[0].n_pairs > 0  # planted truncated copies pair up
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs
        assert hi.n_removed_naive <= lo.n_removed_naive
    # the planted corpus pairs sit at jaccard ~0.8: the 0.9 cutoff
    # must drop (almost) all of them
    assert rows[-1].n_pairs < rows[0].n_pairs


def test_anchor_text_aggregation_planted(spark, tmp_path):
    """Three docs all linking to the same page with two identical
    anchors -> the dominant anchor and the counts are exact."""
    from clickstreamtoclickhouse_spark import plans

    # doc_ids chosen so (7d+3) % P collide: P = max(doc_id)//3+1 = 3
    # d=0 -> 0, d=3 -> 0, d=6 -> 0 (and 13d+5: 2, 2, 2)
    docs = [
        (0, "alpha beta gamma tail words", "en", "s", 10),
        (3, "alpha beta gamma other", "en", "s", 10),
        (6, "different anchor here", "en", "s", 10),
        (9, "pad doc text", "en", "s", 10),  # P = 9//3+1 = 4
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r.target_page: r
        for r in plans.QUERIES["anchor_text_aggregation"](
            spark, str(tmp_path)
        ).collect()
    }
    # P=4: link1 targets (7d+3)%4 = d=0->3, 3->0, 6->1, 9->2
    #      link2 targets (13d+5)%4 = d=0->1, 3->0, 6->3, 9->2
    # page 0 gets two in-links from doc 3 (both its links):
    assert out[0].n_inlinks == 2
    assert out[0].top_anchor == "alpha beta gamma"
    assert out[0].n_unique_anchors == 1 and out[0].top_anchor_count == 2
    # page 2 gets both links of doc 9
    assert out[2].n_inlinks == 2 and out[2].top_anchor == "pad doc text"
    # page 3: doc 0's link1 + doc 6's link2 -> two distinct anchors,
    # deterministic tie -> lexicographically LARGER anchor wins
    assert out[3].n_inlinks == 2 and out[3].n_unique_anchors == 2
    assert out[3].top_anchor == "different anchor here"
    assert out[3].top_anchor_count == 1


def test_lsh_banding_sweep_s_curve(spark):
    """The banding trade-off must behave like the theory says: recall
    non-decreasing in band count, measured recall tracking the
    1-(1-j^r)^b capture probability at the planted similarity, and
    the 16x1 config paying for its recall with collapsed precision."""
    from clickstreamtoclickhouse_spark import plans
    from .conftest import SF_DIR_MED

    rows = sorted(
        plans.QUERIES["lsh_banding_sweep"](spark, SF_DIR_MED).collect(),
        key=lambda r: r.bands,
    )
    assert [(r.bands, r.rows_per_band) for r in rows] == [
        (2, 8), (4, 4), (8, 2), (16, 1)
    ]
    recalls = [r.pair_recall for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert r.n_overlap <= min(r.n_truth, r.n_candidates)
        assert abs(r.pair_recall - r.capture_at_08) < 0.15, r
    # the shipped 4x4 primary sits on the S-curve's useful shoulder
    assert rows[1].pair_recall > 0.7 and rows[1].pair_precision > 0.9
    # 16x1: single-minimum buckets flood candidates
    assert rows[3].pair_recall > 0.99 and rows[3].pair_precision < 0.5


def test_event_burstiness_planted(spark, tmp_path):
    """Perfectly periodic traffic -> B = -1; heavy-tailed bursts ->
    B > 0 (formula sanity on planted timing, not just parity)."""
    from datetime import timedelta

    from clickstreamtoclickhouse_spark import plans

    rows = []
    # user 1, type 'tick': one event every 60s (periodic)
    for i in range(40):
        rows.append(
            (i, _TS + timedelta(seconds=60 * i), 1, "tick", 1.0, None)
        )
    # user 2, type 'burst': tight 1s bursts separated by huge gaps
    t, eid = _TS, 1000
    for burst in range(5):
        for j in range(8):
            rows.append((eid, t, 2, "burst", 1.0, None))
            eid += 1
            t += timedelta(seconds=1)
        t += timedelta(seconds=50_000)
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in plans.QUERIES["event_burstiness_by_type"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["tick"].burstiness == -1.0
    assert out["tick"].std_gap_sec == 0.0
    assert out["burst"].burstiness > 0.4, out["burst"]


def test_vocab_drift_planted(spark, tmp_path):
    """A token planted only in even-doc_id (half A) documents must
    carry by far the largest chi-square contribution; balanced filler
    tokens contribute ~0."""
    from clickstreamtoclickhouse_spark import plans

    docs = []
    for i in range(40):
        base = "alpha beta gamma delta epsilon"
        if i % 2 == 0:
            base += " driftword driftword driftword"
        docs.append((i, base, "en", "s", len(base)))
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    rows = plans.QUERIES["vocab_drift_report"](
        spark, str(tmp_path)
    ).collect()
    by_tok = {r.token: r for r in rows}
    dw = by_tok["driftword"]
    assert dw.count_b == 0 and dw.count_a == 60
    others = [r.chi2_term for r in rows if r.token != "driftword"]
    assert dw.chi2_term > 10 * max(others)
    assert rows[0].chi2_total >= dw.chi2_term
    # shares are within-half normalized
    assert abs(sum(r.share_a for r in rows) - 1.0) < 0.001
    assert abs(sum(r.share_b for r in rows) - 1.0) < 0.001
