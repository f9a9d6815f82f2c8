"""Round-15 interleaved A/B, ONE JVM (the only comparison the repo
trusts — host drift between sessions/runs is ±20%).

Arms:
  - graph_random_walks / part_copurchase_kcore /
    part_copurchase_communities with graphNodeJoin=broadcast (r15
    default) vs =shuffle (the r14 plan shape at runtime) — the conf
    gate IS the A/B switch.
  - part_link_prediction: the r15 bounded-array pair generation vs the
    r14 checkpoint-pinned window + self-join, both built inline here
    from the same session edge cache.

Prints one JSON line with min-of-N per (query, arm), alternating
passes so a host stall cannot bias one arm.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
KEY = "spark.clickstreamtoclickhouse.graphNodeJoin"
CONF_QUERIES = [
    "graph_random_walks",
    "part_copurchase_kcore",
    "part_copurchase_communities",
]


def old_link_prediction(spark, sf_dir):
    """The r14 shape: window cap + lazy checkpoint pin + wedge
    self-join + separate degree join (verbatim from the r14 tree)."""
    from pyspark.sql.window import Window as W

    from clickstreamtoclickhouse_spark.plans.tpch import (
        _LP_NEIGHBOR_CAP,
        _LP_TOPK,
        _copurchase_edges,
    )

    edges = _copurchase_edges(spark, sf_dir)
    und = edges.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionByName(
        edges.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    deg = und.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("d"))
    capped = (
        und.withColumn(
            "r", F.row_number().over(W.partitionBy("z").orderBy("nb"))
        )
        .filter(F.col("r") <= _LP_NEIGHBOR_CAP)
        .select("z", "nb")
        .localCheckpoint(eager=False)
    )
    ca, cb = capped.alias("ca"), capped.alias("cb")
    wedges = ca.join(
        cb,
        (F.col("ca.z") == F.col("cb.z")) & (F.col("ca.nb") < F.col("cb.nb")),
    ).select(
        F.col("ca.nb").alias("pa"),
        F.col("cb.nb").alias("pb"),
        F.col("ca.z").alias("z"),
    )
    non_edges = wedges.join(
        edges,
        (wedges.pa == edges.u) & (wedges.pb == edges.v),
        "left_anti",
    )
    cand = (
        non_edges.join(deg, "z")
        .groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("adamic_adar"),
        )
    )
    return (
        cand.select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "common_neighbors",
            "adamic_adar",
        )
        .orderBy(F.desc("common_neighbors"), "part_a", "part_b")
        .limit(_LP_TOPK)
    )


def main() -> None:
    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.session import get_spark
    from clickstreamtoclickhouse_spark.util import (
        release_transient_checkpoints,
    )

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-r15-graph")
    plans.load(spark, SF_DIR, "lineitem").count()

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    best: dict[str, float] = {}
    hist: dict[str, list[float]] = {}

    def run(tag: str, build) -> None:
        t = noop(build())
        best[tag] = round(min(best.get(tag, float("inf")), t), 3)
        hist.setdefault(tag, []).append(round(t, 3))
        print(f"# {tag}: {t:.2f}s", file=sys.stderr, flush=True)
        release_transient_checkpoints(spark)

    for _ in range(passes):
        for q in CONF_QUERIES:
            for mode in ("broadcast", "shuffle"):
                spark.conf.set(KEY, mode)
                run(f"{q}[{mode}]", lambda q=q: plans.QUERIES[q](spark, SF_DIR))
        spark.conf.set(KEY, "broadcast")
        run("part_link_prediction[r15]",
            lambda: plans.QUERIES["part_link_prediction"](spark, SF_DIR))
        run("part_link_prediction[r14]",
            lambda: old_link_prediction(spark, SF_DIR))

    print(json.dumps({"best": best, "hist": hist}))


if __name__ == "__main__":
    main()
