"""Round-12 settlement A/B for the r11 `hybrid_search_rrf` bench
regression (judge item #1): 1.25 s (r10) -> 6.0 s (r11 committed) with
ZERO functional change to retrieval.py.

Hypothesis under test (the judge's): `_HB_INDEX_CACHE` /
`_TF_CACHE`'s localCheckpoint blocks do not survive to the warm
passes in the 278-query bench context (storage pressure), so the
"warm" number silently pays a partial rebuild.

Protocol (same-session, interleaved — the r9 graph-trio standard):
  1. cold hybrid_search_rrf, then warm x2, at sf0.1 (isolated floor)
  2. snapshot RDD storage (id, name, partitions cached, mem/disk
     bytes) for every persisted RDD
  3. pressure phase: run the bench's heaviest cache-backed queries
     (every SessionDFCache consumer family) once, as the bench would
  4. warm hybrid again x2 + storage snapshot - if the checkpoint
     blocks survived, this must match step 1's warm number
  5. evict + rebuild to measure the pure rebuild cost for reference

Writes AB_HYBRID.json; human-readable trace on stderr.
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
    _SESSION_CACHES,
    evict_session_caches,
)

SF = "/root/testdata/sf0.1"

PRESSURE = [
    # the bench's top-cost tier, one run each — every SessionDFCache
    # consumer family is represented (copurchase edges + triangles,
    # corpus tf, shingles, chain assignments) plus the big uncached
    # shuffles that compete for executor storage
    "graph_random_walks",
    "part_copurchase_communities",
    "doc_topic_clusters",
    "lsh_banding_sweep",
    "dedup_recall_report",
    "corpus_build_manifest",
    "part_copurchase_kcore",
    "leakage_safe_split",
    "embedding_pq_topk",
    "incremental_embedding_dedup",
    "part_entity_resolution",
    "part_link_prediction",
    "simhash_near_dups_capped",
    "simhash_near_dups",
    "bpe_merges",
    "part_clustering_coefficient",
    "transition_pagerank",
    "user_activity_similarity_uncapped",
    "embedding_ivf_topk",
    "dsir_importance_weights",
    "embedding_dedup_reps",
    "minhash_near_dups",
    "jaccard_near_dups",
    "dedup_clusters",
    "dedup_threshold_sweep",
]


def run(spark, name: str) -> float:
    t0 = time.perf_counter()
    plans.QUERIES[name](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    el = time.perf_counter() - t0
    print(f"# {name}: {el:.2f}s", file=sys.stderr, flush=True)
    return round(el, 3)


def storage(spark) -> list[dict]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return [
        {
            "id": i.id(),
            "name": str(i.name()),
            "cached_parts": i.numCachedPartitions(),
            "total_parts": i.numPartitions(),
            "mem_mb": round(i.memSize() / 1e6, 1),
            "disk_mb": round(i.diskSize() / 1e6, 1),
        }
        for i in infos
    ]


def cache_keys() -> dict[str, int]:
    return {c.name: len(c) for c in _SESSION_CACHES}


def main() -> None:
    spark = get_spark(app_name="ab_hybrid_cache")
    plans.load(spark, SF, "lineitem").count()  # session warmup

    out: dict = {}
    out["cold"] = run(spark, "hybrid_search_rrf")
    out["warm_isolated"] = [run(spark, "hybrid_search_rrf")
                            for _ in range(2)]
    out["storage_after_warm"] = storage(spark)
    out["cache_entries_after_warm"] = cache_keys()

    t0 = time.perf_counter()
    out["pressure_each"] = {q: run(spark, q) for q in PRESSURE}
    out["pressure_total"] = round(time.perf_counter() - t0, 1)

    out["warm_under_pressure"] = [run(spark, "hybrid_search_rrf")
                                  for _ in range(2)]
    out["storage_after_pressure"] = storage(spark)
    out["cache_entries_after_pressure"] = cache_keys()

    # reference: pure rebuild cost after explicit eviction
    evict_session_caches()
    out["rebuild_after_evict"] = run(spark, "hybrid_search_rrf")
    out["exact_arm"] = run(spark, "hybrid_search_rrf_exact")

    evict_session_caches()
    spark.stop()
    Path("AB_HYBRID.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: out[k] for k in
                      ("cold", "warm_isolated", "warm_under_pressure",
                       "rebuild_after_evict", "exact_arm",
                       "pressure_total")}))


if __name__ == "__main__":
    main()
