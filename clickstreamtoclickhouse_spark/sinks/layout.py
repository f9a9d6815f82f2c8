"""Multi-dimensional storage layout: Z-order (Morton) clustering.

Single-column sort keys (ClickHouse ORDER BY, our
``insert_df(sort_cols=...)``) give parquet row-group min/max pruning
on ONE leading column. Z-ordering interleaves the bits of several
columns into one sort key so row-group stats stay tight on ALL of
them — the public technique behind Delta's OPTIMIZE ZORDER BY and
Databricks' data-skipping writes (Morton 1966; no proprietary code
involved — the construction is three lines of bit math).

Everything is integer Column arithmetic built as one F.expr string
(codegen-friendly, no py4j per-term cost): min/max normalize each
dimension to `bits` bits, then interleave. The write clusters rows
with repartitionByRange(zkey) + sortWithinPartitions(zkey), so both
files and row groups within files are contiguous in Z space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZKEY = "__zkey"


def _interleave_expr(scaled: list[str], bits: int) -> str:
    k = len(scaled)
    terms = [
        f"shiftleft(shiftright({c}, {b}) & CAST(1 AS BIGINT), {b * k + i})"
        for b in range(bits)
        for i, c in enumerate(scaled)
    ]
    return " + ".join(terms)


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12, key_col: str = ZKEY
) -> DataFrame:
    """Append the Morton key over `cols` (numeric), min-max scaled to
    `bits` bits per dimension. Bounds come from one 1-row aggregate
    broadcast — at scale that is a cheap extra pass, and for
    append-only tables the bounds can be passed from table stats
    instead (the key only needs MONOTONE per-dimension scaling, so
    stale-but-covering bounds stay correct)."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__mx_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(bounds))
    scaled_names = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        s = f"__s_{i}"
        rng = f"(__mx_{i} - __mn_{i})"
        out = out.withColumn(
            s,
            F.expr(
                f"CAST(least(floor((CAST({c} AS DOUBLE) - __mn_{i}) * {top + 1} "
                f"/ (CASE WHEN {rng} = 0 THEN 1 ELSE {rng} END + 1e-9)), "
                f"{top}) AS BIGINT)"
            ),
        )
        scaled_names.append(s)
    out = out.withColumn(key_col, F.expr(_interleave_expr(scaled_names, bits)))
    drop = [f"__mn_{i}" for i in range(len(cols))]
    drop += [f"__mx_{i}" for i in range(len(cols))]
    return out.drop(*scaled_names, *drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 4,
    bits: int = 12,
) -> None:
    """Write parquet clustered in Z space: range-partition on the
    Morton key (contiguous Z ranges per file), sort within partitions
    (contiguous Z ranges per row group). A reader filtering on ANY of
    `cols` skips most files and row groups via min/max stats — the
    multi-dimensional generalization of the single-column sort-key
    clustering in parquet_sink.insert_df."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(ZKEY))
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
