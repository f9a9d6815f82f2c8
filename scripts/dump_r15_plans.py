"""Dump explain('formatted') for the r15-touched queries from a given
tree (worktree for the BEFORE side, repo root for AFTER):

  python scripts/dump_r15_plans.py <tree_root> <out_dir> <suffix> [q ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

DEFAULT = [
    "part_link_prediction",
    "transition_pagerank",
    "bt_source_strengths",
    "minhash_decontamination",
    "minhash_decontamination_by_source",
    "part_copurchase_kcore",
    "part_copurchase_communities",
]


def main() -> None:
    tree, out_dir, suffix = sys.argv[1], Path(sys.argv[2]), sys.argv[3]
    names = sys.argv[4:] or DEFAULT
    sys.path.insert(0, tree)
    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.session import get_spark

    spark = get_spark(app_name=f"dump-r15-{suffix}", cpus=8,
                      shuffle_partitions=8)
    sf_dir = "/root/testdata/sf0.001"
    out_dir.mkdir(parents=True, exist_ok=True)
    import contextlib
    import io

    for name in names:
        df = plans.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"# dumped {name}_{suffix}", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
