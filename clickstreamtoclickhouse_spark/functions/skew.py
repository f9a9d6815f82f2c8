"""Explicit skew mitigation: salted equi-join.

AQE's skew-join handling (pinned in test_plan_quality) splits
oversized SHUFFLE partitions at runtime — but it only applies to
sort-merge/shuffled-hash joins inside one AQE-planned batch query.
It cannot help when the hot key lives in a stream-static join, a
cached/reused exchange, or any plan AQE won't re-split. Salting is
the manual lever: spread the hot key across `num_salts` synthetic
sub-keys on the large side, replicate the small side once per salt,
and join on (keys..., salt). Shuffle partitioning becomes
(key, salt) — a single hot key now lands on num_salts reducers.

Cost model (why this is not the default): the small side is
replicated num_salts× (bounded — it must already be join-small), and
map-side combine on the join key is lost. Use for a measured hot key,
not prophylactically; for plain batch joins prefer AQE.

No reference counterpart (the reference delegates joins to
ClickHouse); SURVEY.md §2.6 extension tier, same 100 TB stance as
rangejoin.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large` ⋈ `small` on `on`, salted `num_salts` ways.

    The salt on the large side is DETERMINISTIC — a hash of the whole
    row, not rand() — so task retries and speculative duplicates
    recompute the same salt (a rand() salt can drop or duplicate rows
    when a lost task is re-executed). Identical rows share a salt;
    that only matters if one exact row repeats at hot-key scale.
    Result equals the unsalted join exactly (salt matches are a
    partition of each key's matches). That equivalence holds only for
    join types where unmatched SMALL-side rows are never emitted: the
    small side is replicated num_salts times, so a right/full outer
    join would emit each unmatched small-side row once per salt.
    `how` is therefore validated against the safe set.
    """
    if not on:
        raise ValueError("salted_join needs at least one join key")
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "left_semi",
            "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower().replace(" ", "") not in safe:
        raise ValueError(
            f"salted_join: how={how!r} is not replication-safe; the small side "
            f"is replicated {num_salts}x, so join types that emit unmatched "
            "small-side rows (right/full outer, cross) would duplicate them. "
            f"Use one of {sorted(safe)}."
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(num_salts))
    l_ = large.withColumn("_salt", salt.cast("int"))
    s_ = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return l_.join(s_, [*on, "_salt"], how).drop("_salt")
