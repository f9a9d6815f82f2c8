"""Benchmark runner: times every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from clickstreamtoclickhouse_spark import plans  # noqa: E402
from clickstreamtoclickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # JVM/session warmup outside the timed region (driver pays this
    # once per cluster, not per query)
    plans.load(spark, sf_dir, "lineitem").count()

    # Two runs per query, report the min (steady state): this host is
    # a microVM with proactive memory reclaim (DAMON) that randomly
    # evicts cold JVM pages, producing multi-second refault stalls
    # unrelated to query cost. Min-of-2 measures the engine, not the
    # hypervisor.
    # Soft wall-clock budget: the host microVM occasionally pauses the
    # JVM for tens of seconds (memory reclaim); if the run is falling
    # behind, drop to single-run mode so the JSON line always gets
    # emitted instead of tripping an outer timeout.
    deadline = time.perf_counter() + float(os.environ.get("BENCH_BUDGET_SEC", "360"))
    timings: dict[str, float] = {}
    for name in sorted(plans.QUERIES):
        fn = plans.QUERIES[name]
        best = float("inf")
        runs = 2 if time.perf_counter() < deadline else 1
        for run in range(runs):
            t0 = time.perf_counter()
            # noop sink forces full JVM-side execution with zero
            # serialization to Python (collect would bottleneck the driver)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = min(best, elapsed)
            print(f"# {name} run{run}: {elapsed:.2f}s", file=sys.stderr, flush=True)
            if time.perf_counter() > deadline:
                break
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
