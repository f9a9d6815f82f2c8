"""Local mirror of the driver's oracle comparison: run a registered
Spark query and its DuckDB oracle on the same parquet tables, sort
columns by name and rows by value, and compare."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def canon(df_pandas):
    """Sort columns by name, canonicalize values, sort rows."""
    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def assert_query_matches_oracle(spark, name: str, sf_dir: str):
    from clickstreamtoclickhouse_spark import plans

    spark_df = plans.QUERIES[name](spark, sf_dir).toPandas()
    oracle_df = run_oracle(plans.ORACLE[name], sf_dir)
    s, o = canon(spark_df), canon(oracle_df)
    assert len(s) == len(o), f"{name}: row count {len(s)} vs oracle {len(o)}"
    assert list(spark_df.columns.sort_values() if hasattr(spark_df.columns, "sort_values") else sorted(spark_df.columns)) == sorted(oracle_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    for i, (a, b) in enumerate(zip(s, o)):
        assert a == b, f"{name}: first row mismatch at {i}:\n spark={a}\noracle={b}"
