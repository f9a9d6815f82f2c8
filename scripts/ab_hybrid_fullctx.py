"""Round-12 settlement A/B, part 3: reproduce the EXACT bench context
(one full pass over every registered query, alphabetical, like
bench.py's pass 1) and then run hybrid_search_rrf three times
back-to-back.

Discrimination:
- run 1 slow (~bench's 4.4 s) but runs 2-3 back at isolated-warm
  (~2.1 s)  -> the cost is a TRANSIENT first-touch-after-gap effect
  (state gone cold during the ~300 s the rest of the pass takes);
- all three runs slow -> the cost is PERSISTENT session context
  (scheduler/bookkeeping overhead that scales with live RDDs,
  broadcasts, or accumulated executions), which hybrid feels most
  because it has the most stages per run.

Also records codegen compile deltas and /proc/vmstat pgmajfault /
pgsteal deltas per run so page-cache reclaim shows up if present.

Writes AB_HYBRID_FULLCTX.json.
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


def vmstat() -> dict[str, int]:
    out = {}
    for line in Path("/proc/vmstat").read_text().splitlines():
        k, v = line.split()
        if k in ("pgmajfault", "pgsteal_direct", "pgsteal_khugepaged",
                 "pgsteal_kswapd", "pgscan_direct"):
            out[k] = int(v)
    return out


def compiles(spark) -> int:
    m = spark.sparkContext._jvm.org.apache.spark.metrics.source.CodegenMetrics
    return int(m.METRIC_COMPILATION_TIME().getCount())


def run(spark, name: str) -> dict:
    v0, c0 = vmstat(), compiles(spark)
    t0 = time.perf_counter()
    plans.QUERIES[name](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    el = round(time.perf_counter() - t0, 3)
    v1 = vmstat()
    rec = {
        "sec": el,
        "compiles": compiles(spark) - c0,
        "vm_delta": {k: v1[k] - v0[k] for k in v0},
    }
    print(f"# {name}: {el:.2f}s {rec['compiles']} compiles",
          file=sys.stderr, flush=True)
    return rec


def main() -> None:
    spark = get_spark(app_name="ab_hybrid_fullctx")
    plans.load(spark, SF, "lineitem").count()

    out: dict = {}
    names = sorted(plans.QUERIES)
    t0 = time.perf_counter()
    pass1 = {}
    for n in names:
        pass1[n] = run(spark, n)["sec"]
    out["pass1_total_sec"] = round(time.perf_counter() - t0, 1)
    out["pass1_hybrid"] = pass1["hybrid_search_rrf"]

    # pass 2 prefix up to (but excluding) hybrid, exactly like the
    # bench's alphabetical order
    t0 = time.perf_counter()
    for n in names:
        if n >= "hybrid_search_rrf":
            break
        run(spark, n)
    out["pass2_prefix_sec"] = round(time.perf_counter() - t0, 1)

    out["hybrid_back_to_back"] = [run(spark, "hybrid_search_rrf")
                                  for _ in range(3)]
    out["exact_back_to_back"] = [run(spark, "hybrid_search_rrf_exact")
                                 for _ in range(2)]

    evict_session_caches()
    spark.stop()
    Path("AB_HYBRID_FULLCTX.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: out[k] for k in
                      ("pass1_total_sec", "pass1_hybrid",
                       "hybrid_back_to_back", "exact_back_to_back")}))


if __name__ == "__main__":
    main()
