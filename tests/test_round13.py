"""Round-13 behavioral pins: quality-aware keeper selection
(dedup_cluster_best_keeper, corpus_build_manifest_best_keeper) and
the per-split/per-source decontamination breakdown."""
from __future__ import annotations

from clickstreamtoclickhouse_spark import plans

from .conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, source string"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def test_best_keeper_prefers_quality_over_min_id(spark, tmp_path):
    """Planted lower-quality duplicate with the LOWER id: doc 1 is the
    80-word prefix of doc 2's 120-word text (Jaccard 0.66, one chain
    cluster), so min-id keeps 1 but the quality argmax (length term
    saturates with words) must keep 2. Docs 10/11 share IDENTICAL
    text -> identical quality; the tie-break must keep the LOWER id."""
    words = [f"tok{i}" for i in range(120)]
    t10 = " ".join(f"zz{i}" for i in range(50))
    _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(words[:80]), "s"),
            (2, " ".join(words), "s"),
            (10, t10, "s"),
            (11, t10, "s"),
        ],
    )
    out = plans.QUERIES["dedup_cluster_best_keeper"](
        spark, str(tmp_path)
    ).collect()
    by_keeper = {r.keeper_doc_id: r for r in out}
    assert 2 in by_keeper, out  # quality beats min-id
    assert 1 not in by_keeper
    assert by_keeper[2].cluster_size == 6  # 1, 2 + four truncations
    assert 10 in by_keeper  # tie -> lowest id
    assert 11 not in by_keeper
    # keeper quality is the cluster max and matches the doc's score
    assert by_keeper[2].keeper_q_milli == 10000  # 120 words, no punct
    # every cluster emits exactly one keeper
    assign = plans.QUERIES["dedup_clusters"](spark, str(tmp_path)).collect()
    assert len(out) == len({r.component for r in assign})


def test_manifest_best_keeper_flips_near_dup_winner(spark, tmp_path):
    """The manifest's near-dup stage under nd_keeper difference: doc 1
    (80-word prefix, lower quality) vs doc 2 (120 words). min_id keeps
    1 and drops 2; best_quality must keep 2 and drop 1. Filler docs
    give the calibration stage enough per-source mass that the winner
    survives the worst-decile cut."""
    words = [f"tok{i}" for i in range(120)]
    fillers = [
        (100 + i, " ".join(f"fil{i}x{j}" for j in range(30 + i)), "s")
        for i in range(8)
    ]
    _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(words[:80]), "s"), (2, " ".join(words), "s")]
        + fillers,
    )
    kept_min = {
        r.doc_id
        for r in plans.QUERIES["corpus_build_manifest"](
            spark, str(tmp_path)
        ).collect()
    }
    kept_best = {
        r.doc_id
        for r in plans.QUERIES["corpus_build_manifest_best_keeper"](
            spark, str(tmp_path)
        ).collect()
    }
    assert 1 in kept_min and 2 not in kept_min
    assert 2 in kept_best and 1 not in kept_best
    # the two variants differ ONLY in the near-dup keeper choice
    assert kept_min - {1} == kept_best - {2}


def test_contamination_by_split_source_planted(spark, tmp_path):
    """Planted per-split leak: corpus doc 7 (source sA) embeds a
    5-gram of benchmark doc 25 (split bench_1) and nothing else; doc 8
    (source sB) is clean. The breakdown must attribute the leak to
    exactly (bench_1, sA), keep every other grid cell at zero, and
    emit the full splits x sources grid."""
    _write_docs(
        spark,
        tmp_path,
        [
            (25, "alpha beta gamma delta epsilon zeta", "bench"),
            (50, "one two three four five six", "bench"),
            (75, "p1 p2 p3 p4 p5 p6", "bench"),
            (7, "xx yy alpha beta gamma delta epsilon qq", "sA"),
            (8, "clean words only here nothing shared at all", "sB"),
        ],
    )
    rows = plans.QUERIES["contamination_by_split_source"](
        spark, str(tmp_path)
    ).collect()
    grid = {(r.split, r.source): r for r in rows}
    # full grid: 3 splits x 2 corpus sources
    assert set(grid) == {
        (s, src)
        for s in ("bench_0", "bench_1", "bench_2")
        for src in ("sA", "sB")
    }
    leak = grid[("bench_1", "sA")]  # 25 // 25 = 1 -> bench_1
    assert leak.n_contaminated_docs == 1
    assert leak.n_gram_hits == 1  # one shared distinct 5-gram
    assert leak.n_docs_in_source == 1
    assert leak.contaminated_share == 1.0
    for key, r in grid.items():
        if key != ("bench_1", "sA"):
            assert r.n_contaminated_docs == 0 and r.n_gram_hits == 0, key


def test_minhash_decontamination_by_source_covers_planted_leaks(spark):
    """The fuzzy by-split breakdown must surface the query's own
    planted 80%-truncated src0 leaks UNDER source 'src0', label
    splits from the fixed three-way partition, and account for at
    least every corpus doc the corpus-wide query flags."""
    rows = plans.QUERIES["minhash_decontamination_by_source"](
        spark, SF_DIR
    ).collect()
    assert rows
    assert {r.split for r in rows} <= {"bench_0", "bench_1", "bench_2"}
    src0 = [r for r in rows if r.source == "src0"]
    assert src0 and sum(r.n_flagged_docs for r in src0) > 0
    corpus_wide = plans.QUERIES["minhash_decontamination"](
        spark, SF_DIR
    ).count()
    # a doc counts once per split here, so the split-sum dominates
    assert sum(r.n_flagged_docs for r in rows) >= corpus_wide


def test_semantic_diversity_rides_topic_cache_and_bounds(spark):
    """The diversity readout must share doc_topic_clusters' session-
    cached assignment (one Lloyd build serves both) and satisfy the
    information-theoretic bounds: 0 <= H <= ln(n_clusters_used),
    effective_clusters in [1, n_clusters_used], doc counts consistent
    with the clustering totals."""
    import math

    from clickstreamtoclickhouse_spark.plans.ext import (
        _TOPIC_ASSIGN_CACHE,
    )

    clusters = plans.QUERIES["doc_topic_clusters"](spark, SF_DIR).collect()
    app_id = spark.sparkContext.applicationId
    cached = _TOPIC_ASSIGN_CACHE.get((app_id, SF_DIR))
    assert cached is not None  # the build landed in the shared cache
    rows = plans.QUERIES["semantic_diversity_by_source"](
        spark, SF_DIR
    ).collect()
    # same cache object still in place: the second query reused it
    assert _TOPIC_ASSIGN_CACHE.get((app_id, SF_DIR)) is cached
    assert rows
    assert sum(r.n_docs for r in rows) == sum(c.n_docs for c in clusters)
    for r in rows:
        assert 1 <= r.n_clusters_used
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_clusters_used) + 1e-6
        assert 1 - 1e-4 <= r.effective_clusters <= r.n_clusters_used + 1e-4
        assert 0 < r.top_cluster_share <= 1
        if r.n_clusters_used == 1:
            assert r.entropy_nats == 0.0 and r.top_cluster_share == 1.0


def test_contamination_span_scrub_planted(spark, tmp_path):
    """Planted spans: doc 7 embeds benchmark doc 25's single 5-gram
    (tokens 3..7 covered -> 'x1 x2 y1 y2' survives); doc 9 embeds two
    OVERLAPPING benchmark grams (covered 2..7); clean doc 8 passes
    through verbatim with zero removals."""
    _write_docs(
        spark,
        tmp_path,
        [
            (25, "b1 b2 b3 b4 b5 b6", "bench"),
            (7, "x1 x2 b1 b2 b3 b4 b5 y1 y2", "sA"),
            (9, "z b1 b2 b3 b4 b5 b6 z2", "sA"),
            (8, "clean doc with no shared grams here", "sB"),
        ],
    )
    rows = {
        r.doc_id: r
        for r in plans.QUERIES["contamination_span_scrub"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {7, 8, 9}
    assert rows[7].scrubbed_text == "x1 x2 y1 y2"
    assert rows[7].n_tokens_removed == 5 and rows[7].n_tokens_kept == 4
    assert rows[9].scrubbed_text == "z z2"
    assert rows[9].n_tokens_removed == 6 and rows[9].n_tokens_kept == 2
    assert rows[8].scrubbed_text == "clean doc with no shared grams here"
    assert rows[8].n_tokens_removed == 0
    for r in rows.values():
        assert r.n_tokens_removed + r.n_tokens_kept == r.n_tokens


def test_decontamination_method_agreement_consistency(spark, tmp_path):
    """Planted 2x2x2 corners: a verbatim benchmark copy (near-identical
    embedding) lands in (exact=1, fuzzy=1, semantic=1); a PARAPHRASE —
    zero shared 5-grams, zero shared shingles, but an embedding almost
    parallel to the benchmark's — is caught ONLY by the semantic arm
    (0, 0, 1); a clean doc with an orthogonal embedding lands in
    (0, 0, 0). At SF_DIR the exact margin of the matrix must equal
    benchmark_contamination's corpus-wide contaminated count, and
    shares must sum to 1."""
    bench_text = " ".join(f"bm{i}" for i in range(30))
    _write_docs(
        spark,
        tmp_path,
        [
            (25, bench_text, "bench"),
            (7, bench_text, "sA"),  # verbatim copy: all three fire
            # paraphrase: lexically disjoint, semantically the bench doc
            (9, "rewritten with entirely fresh vocabulary throughout", "sA"),
            (8, "totally unrelated clean words nothing shared", "sB"),
        ],
    )
    spark.createDataFrame(
        [
            (25, [1.0, 0.0, 0.0, 0.0], 0),
            (7, [0.99, 0.01, 0.0, 0.0], 0),
            (9, [0.98, -0.02, 0.01, 0.0], 0),
            (8, [0.0, 1.0, 0.0, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    cells = {
        (r.exact_flag, r.fuzzy_flag, r.semantic_flag): r.n_docs
        for r in plans.QUERIES["decontamination_method_agreement"](
            spark, str(tmp_path)
        ).collect()
    }
    assert cells.get((1, 1, 1)) == 1
    assert cells.get((0, 0, 1)) == 1  # embedding-only catch
    assert cells.get((0, 0, 0)) == 1
    assert sum(cells.values()) == 3
    # registry-scale consistency: the exact margin == the corpus-wide
    # exact screen's flag count
    rows = plans.QUERIES["decontamination_method_agreement"](
        spark, SF_DIR
    ).collect()
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-4
    exact_margin = sum(r.n_docs for r in rows if r.exact_flag == 1)
    bc = plans.QUERIES["benchmark_contamination"](spark, SF_DIR)
    assert exact_margin == bc.filter("contaminated = 1").count()


def test_manifest_variants_share_dedup_base_cache(spark):
    """Both manifest variants and keeper_quality_gain consume the SAME
    session-cached (ex, pairs) group build — the second consumer must
    reuse the first's cache entry, not rebuild stages 1-4. r13 advice:
    (ex, pairs) live in ONE group entry so the pair table can never
    outlive the base checkpoint it references."""
    from clickstreamtoclickhouse_spark.plans.ext import (
        _MANIFEST_BASE_CACHE,
    )

    plans.QUERIES["corpus_build_manifest"](spark, SF_DIR).count()
    app_id = spark.sparkContext.applicationId
    entry = _MANIFEST_BASE_CACHE.get((app_id, SF_DIR))
    assert entry is not None and len(entry) == 2
    ex, pairs = entry
    plans.QUERIES["corpus_build_manifest_best_keeper"](spark, SF_DIR).count()
    plans.QUERIES["keeper_quality_gain"](spark, SF_DIR).count()
    entry2 = _MANIFEST_BASE_CACHE.get((app_id, SF_DIR))
    assert entry2[0] is ex and entry2[1] is pairs
    # atomic eviction: one evict call releases BOTH members — no
    # stale pairs entry can survive the base it chains off
    assert _MANIFEST_BASE_CACHE.evict(SF_DIR) == 1
    assert _MANIFEST_BASE_CACHE.get((app_id, SF_DIR)) is None


def test_keeper_quality_gain_recompute(spark):
    """The one-row audit agrees with a direct recomputation from the
    shared pair table and quality scores."""
    from clickstreamtoclickhouse_spark.plans.ext import (
        _manifest_dedup_base,
    )

    row = plans.QUERIES["keeper_quality_gain"](spark, SF_DIR).collect()[0]
    ex, pairs = _manifest_dedup_base(spark, SF_DIR)
    q = {r.doc_id: r.quality for r in ex.select("doc_id", "quality").collect()}
    gains = [
        round(max(q[r.doc_b] - q[r.doc_a], 0.0) * 10000)
        for r in pairs.select("doc_a", "doc_b").collect()
    ]
    assert row.n_pairs == len(gains)
    assert row.n_minid_suboptimal == sum(1 for g in gains if g > 0)
    assert row.total_gain_milli == sum(gains)
    assert row.max_gain_milli == (max(gains) if gains else 0)


def test_winrates_exclude_null_text_docs(spark, tmp_path):
    """r12 advice #3: a NULL-text doc yields q=NULL — it used to be
    counted in n_a/n_b while never matching the q equi-joins, silently
    crediting its pairings to wins_b ON BOTH ENGINES (oracle parity
    cannot catch a shared bias; only a planted test can). With the
    text IS NOT NULL filter, duel counts must cover exactly the
    eligible docs and the accounting must close."""
    rows = [
        (1, "average quality words here", "sA"),
        (2, None, "sA"),  # NULL text: not duel-eligible
        (3, "some other words entirely", "sB"),
        (4, "yet more distinct words", "sB"),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = plans.QUERIES["source_quality_winrates"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("sA", "sB")
    assert r.n_a == 1  # the NULL-text doc is excluded, not counted
    assert r.n_b == 2
    assert r.wins_a + r.wins_b + r.ties == r.n_a * r.n_b


def test_screen_join_shuffle_fallback_parity(spark):
    """util.conf_broadcast (the generalized domain_blocklist_report
    fallback): with screenJoin=shuffle the hit-volume broadcasts in
    the scrub and agreement queries lose their forced hints, and
    results are value-identical either way."""
    key = "spark.clickstreamtoclickhouse.screenJoin"
    names = ("contamination_span_scrub", "decontamination_method_agreement")
    base = {
        n: sorted(map(tuple, plans.QUERIES[n](spark, SF_DIR).collect()))
        for n in names
    }
    spark.conf.set(key, "shuffle")
    try:
        for n in names:
            alt = sorted(map(tuple, plans.QUERIES[n](spark, SF_DIR).collect()))
            assert alt == base[n], n
    finally:
        spark.conf.unset(key)


def test_manifest_best_keeper_stage_invariants(spark):
    """The best-keeper manifest keeps every structural invariant of
    the primary (holdout exclusion, contiguous per-shard steps,
    positive token counts) and never keeps MORE docs than exact-dedup
    allows — the keeper rule changes WHICH member survives, not how
    many clusters survive pairwise."""
    from collections import defaultdict

    rows = plans.QUERIES["corpus_build_manifest_best_keeper"](
        spark, SF_DIR
    ).collect()
    assert rows
    assert all(r["doc_id"] % 25 != 0 for r in rows)
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r["step"])
    for steps in by_shard.values():
        assert sorted(steps) == list(range(1, len(steps) + 1))
    assert all(r["n_tokens"] > 0 for r in rows)
