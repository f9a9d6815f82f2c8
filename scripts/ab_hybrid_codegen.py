"""Round-12 settlement A/B, part 2: WHY is warm `hybrid_search_rrf`
~4.4 s inside the 278-query bench but ~1.6-2.7 s isolated, when
`scripts/ab_hybrid_cache.py` proved the session-cache checkpoint
blocks survive bench-grade storage pressure fully in memory?

Hypothesis: whole-stage-codegen CACHE THRASH. Spark's generated-class
cache (`spark.sql.codegen.cache.maxEntries`, default 100) is flushed
by the ~277 other distinct plans that run between two hybrid passes,
so every bench pass pays full driver-side janino recompilation of
hybrid's dozens of generated classes — isolated back-to-back runs hit
the cache and skip it. CodegenMetrics' compilation counter makes this
directly observable.

Protocol (one session):
  A. cold hybrid, warm x2 — record the codegen-compile COUNT delta of
     each run (warm deltas ~0 if the class cache is doing its job)
  B. flush phase: run ~150 other distinct registered queries once
     (alphabetical a..g prefix — disjoint from hybrid's plan)
  C. hybrid x3 with per-run compile-count deltas — if run 1 shows a
     large delta and costs ~bench-warm (4+ s) while runs 2-3 drop
     back to ~isolated-warm, the thrash hypothesis is confirmed and
     quantified.

Writes AB_HYBRID_CODEGEN.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from clickstreamtoclickhouse_spark import plans  # noqa: E402
from clickstreamtoclickhouse_spark.session import get_spark  # noqa: E402
from clickstreamtoclickhouse_spark.util import (  # noqa: E402
    evict_session_caches,
)

SF = "/root/testdata/sf0.1"


def codegen_counters(spark) -> dict[str, int]:
    m = spark.sparkContext._jvm.org.apache.spark.metrics.source.CodegenMetrics
    return {
        "compile_count": int(m.METRIC_COMPILATION_TIME().getCount()),
        "generated_class_bytes": int(
            m.METRIC_GENERATED_CLASS_BYTECODE_SIZE().getCount()
        ),
    }


def run(spark, name: str) -> tuple[float, dict]:
    before = codegen_counters(spark)
    t0 = time.perf_counter()
    plans.QUERIES[name](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    el = round(time.perf_counter() - t0, 3)
    after = codegen_counters(spark)
    delta = {k: after[k] - before[k] for k in before}
    print(f"# {name}: {el:.2f}s compile_delta={delta['compile_count']}",
          file=sys.stderr, flush=True)
    return el, delta


def main() -> None:
    spark = get_spark(app_name="ab_hybrid_codegen")
    plans.load(spark, SF, "lineitem").count()

    out: dict = {}
    t, d = run(spark, "hybrid_search_rrf")
    out["cold"] = {"sec": t, "compiles": d["compile_count"]}
    out["warm_isolated"] = []
    for _ in range(2):
        t, d = run(spark, "hybrid_search_rrf")
        out["warm_isolated"].append(
            {"sec": t, "compiles": d["compile_count"]}
        )

    flush = [n for n in sorted(plans.QUERIES) if n < "h"][:160]
    out["n_flush_queries"] = len(flush)
    t0 = time.perf_counter()
    for q in flush:
        run(spark, q)
    out["flush_total_sec"] = round(time.perf_counter() - t0, 1)

    out["warm_after_flush"] = []
    for _ in range(3):
        t, d = run(spark, "hybrid_search_rrf")
        out["warm_after_flush"].append(
            {"sec": t, "compiles": d["compile_count"]}
        )

    evict_session_caches()
    spark.stop()
    Path("AB_HYBRID_CODEGEN.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
