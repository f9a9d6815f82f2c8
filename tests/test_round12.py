"""Round-12 behavioral pins: ANSI-safe division in
code_detection_report, the dedup_threshold_sweep broadcast-hint
cleanup, and the round-12 additions (packing_efficiency_report,
bpe_detok_roundtrip)."""
from __future__ import annotations

from .conftest import SF_DIR


def test_packing_efficiency_accounting(spark):
    """Per (packer, shard): capacity - padding + overflow == total
    tokens (each bin contributes min(bin_tokens, cap) +
    max(0, bin_tokens - cap)), fill_rate in (0, 1], and the report
    agrees with a direct recomputation from each packer's own
    assignment output (long-form since r14: one row per packer per
    shard)."""
    from collections import defaultdict

    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.plans.ext import _PACK_BIN

    rows = plans.QUERIES["packing_efficiency_report"](
        spark, SF_DIR
    ).collect()
    assert rows
    assert {r.packer for r in rows} == {"greedy", "bfd"}
    packed = {
        "greedy": plans.QUERIES["sequence_packing"](spark, SF_DIR).collect(),
        "bfd": plans.QUERIES["sequence_packing_bfd"](
            spark, SF_DIR
        ).collect(),
    }
    bins: dict = {p: defaultdict(int) for p in packed}
    for p, rs in packed.items():
        for r in rs:
            bins[p][(r.shard, r.bin)] += r.n_tokens
    for r in rows:
        assert r.capacity_tokens == r.n_bins * _PACK_BIN
        # conservation: filled + overflow == total
        assert (r.capacity_tokens - r.padding_tokens + r.overflow_tokens
                == r.total_tokens)
        assert 0.0 < r.fill_rate <= 1.0
        shard_bins = {
            b: t for (s, b), t in bins[r.packer].items() if s == r.shard
        }
        assert r.n_bins == len(shard_bins)
        assert r.total_tokens == sum(shard_bins.values())
        assert r.padding_tokens == sum(
            max(0, _PACK_BIN - t) for t in shard_bins.values()
        )
        assert r.overflow_tokens == sum(
            max(0, t - _PACK_BIN) for t in shard_bins.values()
        )


def test_bpe_detok_roundtrip_is_lossless(spark):
    """BPE merges only concatenate adjacent symbols, so decode
    (concat of final symbols in position order) must reproduce every
    vocabulary word — 100% round-trip success and exact character
    conservation, at every final token count."""
    from clickstreamtoclickhouse_spark import plans

    rows = plans.QUERIES["bpe_detok_roundtrip"](spark, SF_DIR).collect()
    assert rows
    assert sum(r.n_words for r in rows) > 0
    for r in rows:
        assert r.n_roundtrip_ok == r.n_words, r
        assert r.n_word_chars == r.n_token_chars, r
    # the merge loop actually merged something: some words end at
    # fewer tokens than their character count
    assert any(r.n_tokens < 4 for r in rows)


def test_code_detection_nan_free_on_symbol_only_docs(spark, tmp_path):
    """Symbol-only text (non-blank after trim) must neither trip the
    codeish flag nor leak NaN/Inf into the per-source ratios.

    With the whitespace tokenizer a non-blank doc always has >=1
    token, so the n_tokens=0 branch is defensive — but the nullif
    guard (plans/corpus.py) pins the behavior either way: a NULL
    keyword ratio makes the conjunctive flag a deterministic 0."""
    import math

    from clickstreamtoclickhouse_spark import plans

    soup = "{};;=<>[]()"  # 1 whitespace token, 0 keywords
    docs = [
        (1, soup, "en", "soup", len(soup)),
        (2, "the plain prose of it", "en", "prose", 21),
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
    assert out["soup"].n_codeish == 0
    for row in out.values():
        for field in ("codeish_share", "symbol_density",
                      "keywords_per_100_tokens"):
            v = row[field]
            assert v is None or math.isfinite(v), (row.source, field, v)
    assert out["soup"].keywords_per_100_tokens == 0.0


def test_cluster_size_histogram_accounting(spark):
    """Histogram agrees with dedup_clusters: per size s, n_clusters
    counts components of that size, docs/removed follow exactly, and
    the planted chain corpus ({orig, 80%, 64%} per source doc) must
    show multi-doc clusters."""
    from collections import Counter

    from clickstreamtoclickhouse_spark import plans

    assign = plans.QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    comp_sizes = Counter(r.component for r in assign)
    by_size = Counter(comp_sizes.values())
    rows = {
        r.cluster_size: r
        for r in plans.QUERIES["dedup_cluster_size_histogram"](
            spark, SF_DIR
        ).collect()
    }
    assert set(rows) == set(by_size)
    n_total = len(assign)
    for s, n_clusters in by_size.items():
        r = rows[s]
        assert r.n_clusters == n_clusters
        assert r.n_docs == n_clusters * s
        assert r.n_removed == n_clusters * (s - 1)
        assert abs(r.doc_share - n_clusters * s / n_total) < 1e-6
    assert any(s >= 3 for s in by_size), "planted chains missing"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )


def _quality_ladder_docs():
    """Three sources with strictly ordered quality: the composite
    score is monotone in word count below 100 words (clean prose,
    no punctuation), so hi > mid > lo on every cross-source duel."""
    mk = lambda n: " ".join(f"word{i % 7}" for i in range(n))
    rows = []
    did = 0
    for src, n_words, n_docs in (
        ("lo", 10, 4), ("mid", 50, 5), ("hi", 100, 3),
    ):
        for _ in range(n_docs):
            t = mk(n_words)
            rows.append((did, t, "en", src, len(t)))
            did += 1
    return rows


def test_source_winrates_planted_dominance(spark, tmp_path):
    from clickstreamtoclickhouse_spark import plans

    _write_docs(spark, tmp_path, _quality_ladder_docs())
    rows = {
        (r.source_a, r.source_b): r
        for r in plans.QUERIES["source_quality_winrates"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(rows) == 3  # 3 sources -> 3 unordered pairs
    for (a, b), r in rows.items():
        # exhaustive accounting on every pair
        assert r.wins_a + r.wins_b + r.ties == r.n_a * r.n_b
        assert r.ties == 0  # scores strictly ordered across sources
    order = {"lo": 0, "mid": 1, "hi": 2}
    for (a, b), r in rows.items():
        if order[a] > order[b]:
            assert r.winrate_a == 1.0 and r.wins_a == r.n_a * r.n_b
        else:
            assert r.winrate_a == 0.0 and r.wins_b == r.n_a * r.n_b


def test_source_winrates_accounting_on_sf_data(spark):
    from clickstreamtoclickhouse_spark import plans

    rows = plans.QUERIES["source_quality_winrates"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert r.wins_a + r.wins_b + r.ties == r.n_a * r.n_b
        assert 0.0 <= r.winrate_a <= 1.0


def test_bt_strengths_recover_planted_order(spark, tmp_path):
    from clickstreamtoclickhouse_spark import plans

    _write_docs(spark, tmp_path, _quality_ladder_docs())
    got = {
        r.source: r
        for r in plans.QUERIES["bt_source_strengths"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["hi"].strength > got["mid"].strength > got["lo"].strength
    assert [got[s].rank for s in ("hi", "mid", "lo")] == [1, 2, 3]
    # normalized to mean 1 over k sources
    assert abs(sum(r.strength for r in got.values()) - 3.0) < 1e-3


def test_label_noise_report_flags_planted_mislabel(spark, tmp_path):
    """A doc labeled 'de' whose text is plainly English stopword
    prose must land in the ('de', 'en') off-diagonal cell; clean
    docs stay on the diagonal."""
    from clickstreamtoclickhouse_spark import plans

    en = "the cat is not in the hat and it is a cat that sat"
    de = "der hund ist nicht ein hund und das ist der hund mit"
    rows = []
    did = 0
    for _ in range(5):
        rows.append((did, en, "en", "s", len(en))); did += 1
        rows.append((did, de, "de", "s", len(de))); did += 1
    rows.append((did, en, "de", "s", len(en)))  # the planted mislabel
    _write_docs(spark, tmp_path, rows)
    out = {
        (r.noisy_label, r.confident_label): r
        for r in plans.QUERIES["label_noise_report"](
            spark, str(tmp_path)
        ).collect()
    }
    assert ("de", "en") in out and out[("de", "en")].n_docs == 1
    assert out[("de", "en")].is_offdiag == 1
    assert out[("en", "en")].n_docs == 5
    assert out[("de", "de")].n_docs == 5
    assert out[("de", "de")].is_offdiag == 0
    # shares within each noisy label sum to 1
    for lbl in ("de", "en"):
        tot = sum(r.share_of_noisy for (n, _), r in out.items() if n == lbl)
        assert abs(tot - 1.0) < 1e-5
