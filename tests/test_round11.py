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

    def cached_rdds() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    for c in caches:
        c.clear()
    base = cached_rdds()
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    for i, c in enumerate(caches):
        for d in (d1, d2):
            df = c.get_or_build(
                spark, d, lambda i=i: spark.range(5 + i).selectExpr(
                    "id", f"id * {i + 1} as x"
                )
            )
            df.count()  # materialize the checkpoint blocks
    assert all(len(c) == 2 for c in caches)
    built = cached_rdds()
    assert built >= base + 2 * len(caches), (base, built, len(caches))
    # per-dir eviction releases EVERY cache's d1 entry and its storage
    n = util.evict_session_caches(d1)
    assert n == len(caches)
    assert all(len(c) == 1 for c in caches)
    after_d1 = cached_rdds()
    assert after_d1 <= built - len(caches), (built, after_d1)
    # evict-all drains the rest
    assert util.evict_session_caches() == len(caches)
    assert all(len(c) == 0 for c in caches)
    assert cached_rdds() <= base
