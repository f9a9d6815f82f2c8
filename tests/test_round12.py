"""Round-12 behavioral pins: ANSI-safe division in
code_detection_report, the dedup_threshold_sweep broadcast-hint
cleanup, and the round-12 additions (packing_efficiency_report,
bpe_detok_roundtrip)."""
from __future__ import annotations

from .conftest import SF_DIR


def test_packing_efficiency_accounting(spark):
    """Per shard: capacity - padding + overflow == total tokens (each
    bin contributes min(bin_tokens, cap) + max(0, bin_tokens - cap)),
    fill_rate in (0, 1], and the report agrees with a direct
    recomputation from sequence_packing's output."""
    from collections import defaultdict

    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.plans.ext import _PACK_BIN

    rows = plans.QUERIES["packing_efficiency_report"](
        spark, SF_DIR
    ).collect()
    assert rows
    packed = plans.QUERIES["sequence_packing"](spark, SF_DIR).collect()
    bins = defaultdict(int)
    for r in packed:
        bins[(r.shard, r.bin)] += r.n_tokens
    for r in rows:
        assert r.capacity_tokens == r.n_bins * _PACK_BIN
        # conservation: filled + overflow == total
        assert (r.capacity_tokens - r.padding_tokens + r.overflow_tokens
                == r.total_tokens)
        assert 0.0 < r.fill_rate <= 1.0
        shard_bins = {b: t for (s, b), t in bins.items() if s == r.shard}
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
