"""Round-12 behavioral pins: ANSI-safe division in
code_detection_report, the dedup_threshold_sweep broadcast-hint
cleanup, and the round-12 additions."""
from __future__ import annotations


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
