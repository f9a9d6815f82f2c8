"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_path_not_found(e: Exception) -> bool:
    """True iff an AnalysisException means 'the path does not exist'
    (a normal first-run condition), as opposed to a real failure that
    must propagate."""
    cond = getattr(e, "getCondition", lambda: None)() or ""
    return "PATH_NOT_FOUND" in cond or "Path does not exist" in str(e)


def try_read_parquet(
    spark: SparkSession, path: str, **options: str
) -> DataFrame | None:
    """Read a parquet path, returning None ONLY when the path does not
    exist yet (first run of an incremental/streaming job). Any other
    error — permission, corrupt footer, transient IO — propagates:
    treating those as 'empty' makes callers silently conclude
    'nothing to do' (the failure mode an advisor flagged in
    operators/incremental.py, fixed for every such site here)."""
    from pyspark.errors import AnalysisException

    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.parquet(path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return None
        raise
