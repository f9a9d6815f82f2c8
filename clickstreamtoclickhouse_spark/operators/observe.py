"""Pipeline observability via the Observation API.

`df.observe(...)` attaches aggregate metrics to a plan that are
computed AS A SIDE EFFECT of whatever action runs — no second scan,
no extra job. That is the correct way to get row counts / null
counts / quarantine rates out of a 100 TB ingest: the naive
`df.count()`-then-`df.write` pattern reads the input twice.

The reference prints tabulate summaries from driver-side pandas
(seghouse/jobs/send_to_warehouse.py uses full materialized frames);
this is the distributed equivalent with zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_ingest_metrics(
    df: DataFrame,
    value_col: str | None = None,
    name: str = "ingest",
) -> tuple[DataFrame, Observation]:
    """Attach standard ingest metrics (row count, per-column null
    counts, optional value sum) to `df`. Run any action on the
    returned frame, then read `observation.get` — e.g.
    {'n_rows': ..., 'nulls_user_id': ..., 'sum_value': ...}."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    if value_col is not None:
        metrics.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return df.observe(obs, *metrics), obs
