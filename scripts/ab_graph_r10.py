"""Round-10 A/B: settle the graph-family regression (VERDICT r9 #1).

The trio (part_copurchase_communities, part_entity_resolution,
part_link_prediction) moved +47-74% between the r8 and r9 DRIVER
bench files while the registry median moved ~12%. Code diff r8->r9
for all three is a pure refactor (stage-split + cache eviction sweep
— identical plan shape), so the candidates are (a) edge-cache
cold-build attribution inside min-of-N interleaving, (b) host drift.

This script measures, in ONE JVM per tree:
  - edge_build_s: cold materialization of the shared
    `_copurchase_edges` checkpoint, timed alone;
  - per-query COLD-ISOLATED: cache evicted before each query (the
    worst-case attribution: every cache user pays the full build);
  - per-query WARM min-of-N: bench.py's steady-state number.

Run it against two checked-out trees back-to-back (alternating
passes happen INSIDE each JVM; the two JVMs run within minutes on
the same host window) to compare r8-shape vs r9-shape:

  python scripts/ab_graph_r10.py                 # current tree
  python scripts/ab_graph_r10.py --repo /tmp/r8tree --label r8

Prints one JSON line; paste both into BENCH_NOTES_r10.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

QUERIES = [
    "part_copurchase_communities",
    "part_entity_resolution",
    "part_link_prediction",
    "part_copurchase_triangles",  # control: flat r8->r9
    "part_copurchase_kcore",      # control: flat r8->r9
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=str(Path(__file__).resolve().parents[1]))
    ap.add_argument("--label", default="current")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.plans import tpch
    from clickstreamtoclickhouse_spark.session import get_spark

    def evict() -> None:
        # r8's tree has no evict hook; clearing the dict is equivalent
        # for attribution (the checkpoint blocks stay until GC, but a
        # fresh build is forced either way)
        if hasattr(tpch, "evict_copurchase_edges"):
            tpch.evict_copurchase_edges()
        else:
            tpch._COPURCHASE_CACHE.clear()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    spark = get_spark(app_name=f"ab-graph-{args.label}")
    plans.load(spark, args.sf_dir, "lineitem").count()  # JVM warmup

    # 1) edge build alone, cold
    evict()
    t0 = time.perf_counter()
    tpch._copurchase_edges(spark, args.sf_dir).count()
    edge_build_s = round(time.perf_counter() - t0, 3)

    # 2) cold-isolated: evict before EVERY query (worst-case charge)
    cold = {}
    for name in QUERIES:
        evict()
        cold[name] = round(run(name), 3)

    # 3) warm min-of-N (cache stays hot across passes — bench.py's
    # steady state once pass 1 has materialized the checkpoint)
    warm: dict[str, float] = {}
    for p in range(args.passes):
        for name in QUERIES:
            t = run(name)
            warm[name] = round(min(warm.get(name, float("inf")), t), 3)
            print(f"# {args.label} warm pass{p + 1} {name}: {t:.2f}s",
                  file=sys.stderr, flush=True)

    print(json.dumps({
        "label": args.label,
        "sf_dir": args.sf_dir,
        "edge_build_s": edge_build_s,
        "cold_isolated": cold,
        "warm_min": warm,
        "passes": args.passes,
    }))


if __name__ == "__main__":
    main()
