"""util.try_read_parquet: the first-run contract every incremental /
streaming bootstrap path depends on — None ONLY for genuinely-no-data
(missing path, existing-but-empty dir), propagation for everything
else (a swallowed real error silently restarts state from scratch)."""

from __future__ import annotations

import os

import pytest

from clickstreamtoclickhouse_spark.util import portable_id_hash, try_read_parquet


def test_missing_path_is_first_run(spark, tmp_path):
    assert try_read_parquet(spark, str(tmp_path / "nope")) is None


def test_existing_empty_dir_is_first_run(spark, tmp_path):
    d = tmp_path / "pre_created"
    d.mkdir()  # ops pre-created the output dir: still "no data yet"
    assert try_read_parquet(spark, str(d)) is None


def test_real_data_reads(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(3).write.parquet(p)
    df = try_read_parquet(spark, p)
    assert df is not None and df.count() == 3


def test_corrupt_footer_propagates(spark, tmp_path):
    # a directory WITH a parquet-named file whose footer is garbage is
    # NOT a first run — treating it as empty would silently discard
    # the existing (damaged) state instead of surfacing it
    d = tmp_path / "damaged"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        df = try_read_parquet(spark, str(d))
        # schema inference may be lazy for some layouts — force it
        if df is not None:
            df.collect()


def test_portable_id_hash_matches_duckdb(spark):
    import duckdb

    from pyspark.sql import functions as F

    df = spark.range(0, 50).select(F.col("id"))
    got = {
        r["id"]: r["h"]
        for r in df.select("id", portable_id_hash("id").alias("h")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))::BIGINT "
            "FROM range(50) t(i)"
        ).fetchall()
    )
    assert got == want
