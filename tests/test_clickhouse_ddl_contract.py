"""ClickHouse-dialect DDL contract: render every statement the
reference emits (create database, the seven well-known tables +
dynamic per-event tables, users, misfits, column evolution) from BOTH
implementations and byte-compare after whitespace normalization.

Reference templates are reproduced verbatim from
/root/reference/seghouse/warehouse/clickhouse.py (cited per function)
so the comparison is against the exact strings a ClickHouse server
would receive — this pins the dialect contract without a server (the
write/describe machinery itself is driven end-to-end against embedded
Derby in test_sinks_streaming.py).

Documented deviations (normalized away below, each deliberate):

1. identifier quoting — ours backtick-quotes schema/table/column
   (defensive against reserved words); the reference interpolates
   bare names. Backticks are stripped before comparison.
2. timestamp precision — ours maps DATETIME to DateTime64(3) (the
   reference's DateTime is second-precision; Segment timestamps carry
   millis, and the reference itself parses millis then truncates).
   DateTime64(3) is rewritten to DateTime before comparison.
3. misfits engine ordering — same engine + ORDER BY; the reference
   hardcodes the column list, ours renders it from MISFITS_STRUCTURE
   (same six columns in the same order).
"""

from __future__ import annotations

import re

from clickstreamtoclickhouse_spark import tables
from clickstreamtoclickhouse_spark.sinks import clickhouse as ch
from clickstreamtoclickhouse_spark.tables import (
    DT_TO_SPARK,
    MISFITS_STRUCTURE,
    DataType,
)

# ---------------------------------------------------------------------------
# Reference renderers — templates copied byte-for-byte from
# seghouse/warehouse/clickhouse.py (DDL strings only; no logic reused).
# ---------------------------------------------------------------------------

# clickhouse.py:15-33 (DT_TO_CH_DT), keyed by our logical enum
REF_DT_TO_CH = {
    DataType.STRING: "String",
    DataType.INT64: "Int64",
    DataType.FLOAT64: "Float64",
    DataType.BOOLEAN: "UInt8",
    DataType.DATETIME: "DateTime",
    DataType.DATE: "Date",
}


def ref_col_def(name: str, dt: DataType, non_null: list[str]) -> str:
    # clickhouse.py:125-134 (to_ch_column_def)
    ch_type = REF_DT_TO_CH[dt]
    if name not in non_null:
        ch_type = f"Nullable({ch_type})"
    return f"{name} {ch_type}"


def ref_create_database(schema: str, cluster: str | None = None) -> str:
    # clickhouse.py:58-63 (create_schema)
    sql = f"CREATE DATABASE IF NOT EXISTS {schema}"
    if cluster:
        sql = f"{sql} ON CLUSTER {cluster}"
    return sql


def ref_create_table(
    schema: str, table: str, col_types: dict, non_null: list[str]
) -> str:
    # clickhouse.py:69-93 (create_table) — exact template incl. layout
    column_type_defs = [
        ref_col_def(n, t, non_null) for n, t in col_types.items()
    ]
    return f"""
            CREATE TABLE IF NOT EXISTS {schema}.{table}
            (
                {', '.join(column_type_defs)}
            ) ENGINE = ReplacingMergeTree()
            PARTITION BY toDate(timestamp)
            ORDER BY (timestamp, message_id)
            """


def ref_create_users_table(
    schema: str, col_types: dict, non_null: list[str]
) -> str:
    # clickhouse.py:95-123 (create_users_table)
    column_type_defs = [
        ref_col_def(n, t, non_null) for n, t in col_types.items()
    ]
    return f"""
            CREATE TABLE IF NOT EXISTS {schema}.users
            (
                {', '.join(column_type_defs)}
            ) ENGINE = ReplacingMergeTree(ver)
            ORDER BY (user_id)
            """


def ref_create_misfits_table(schema: str) -> str:
    # clickhouse.py:217-238 (create_misfits_table) — hardcoded columns
    return f"""
                            CREATE TABLE IF NOT EXISTS {schema}.misfits
                            (
                                message_id String,
                                table_name String,
                                column_name String,
                                column_value String,
                                expected_data_type String,
                                actual_data_type String
                            ) ENGINE = ReplacingMergeTree()
                            ORDER BY (message_id, table_name, column_name)
                            """


def ref_add_column(
    schema: str, table: str, column: str, dt: DataType, non_null: list[str]
) -> str:
    # clickhouse.py:185-191 (add_column)
    return (
        f"ALTER TABLE {schema}.{table} ADD COLUMN IF NOT EXISTS "
        f"{ref_col_def(column, dt, non_null)}"
    )


# ---------------------------------------------------------------------------
# Normalization (applies the three documented deviations)
# ---------------------------------------------------------------------------


def norm(sql: str) -> str:
    sql = sql.replace("`", "")  # deviation 1
    sql = sql.replace("DateTime64(3)", "DateTime")  # deviation 2
    sql = re.sub(r"\s+", " ", sql).strip()
    return re.sub(r"\(\s+", "(", re.sub(r"\s+\)", ")", sql))


# non-null sets: send_to_warehouse.py:101 and :180
NON_NULL = ["received_at", "timestamp", "message_id"]
USERS_NON_NULL = NON_NULL + ["ver", "user_id"]


def to_spark_types(structure: dict) -> dict:
    return {n: DT_TO_SPARK[dt] for n, dt in structure.items()}


def test_create_database_matches():
    assert norm(ch.ddl_create_database("warehouse_ns")) == norm(
        ref_create_database("warehouse_ns")
    )
    assert norm(ch.ddl_create_database("ns", cluster="c1")) == norm(
        ref_create_database("ns", cluster="c1")
    )


def test_event_table_ddl_matches_for_all_default_tables():
    # the six event-routed tables plus a dynamic per-track-event table
    # all go through create_table (send_to_warehouse.py:302) with the
    # base/tracks structures
    cases = {
        tables.TABLE_TRACKS: tables.TRACKS_STRUCTURE,
        tables.TABLE_SCREENS: tables.DEFAULT_STRUCTURE,
        tables.TABLE_IDENTITIES: tables.DEFAULT_STRUCTURE,
        tables.TABLE_PAGES: tables.DEFAULT_STRUCTURE,
        tables.TABLE_GROUPS: tables.DEFAULT_STRUCTURE,
        tables.TABLE_ALIASES: tables.DEFAULT_STRUCTURE,
        "product_clicked": tables.TRACKS_STRUCTURE,  # dynamic event table
    }
    for table, structure in cases.items():
        ours = ch.ddl_create_table(
            "ns", table, to_spark_types(structure), tuple(NON_NULL)
        )
        ref = ref_create_table("ns", table, structure, NON_NULL)
        assert norm(ours) == norm(ref), table


def test_users_table_ddl_matches():
    users_structure = {**tables.DEFAULT_STRUCTURE, "ver": DataType.INT64}
    ours = ch.ddl_create_users_table(
        "ns", to_spark_types(users_structure), tuple(USERS_NON_NULL)
    )
    ref = ref_create_users_table("ns", users_structure, USERS_NON_NULL)
    assert norm(ours) == norm(ref)


def test_misfits_table_ddl_matches():
    assert norm(ch.ddl_create_misfits_table("ns")) == norm(
        ref_create_misfits_table("ns")
    )
    # and the six columns come from the same structure contract
    assert list(MISFITS_STRUCTURE) == [
        "message_id",
        "table_name",
        "column_name",
        "column_value",
        "expected_data_type",
        "actual_data_type",
    ]


def test_add_column_ddl_matches_evolution_cases():
    # schema evolution emits one ALTER per new column
    # (send_to_warehouse.py:307); cover every inferable logical type,
    # nullable and non-null
    cases = [
        ("tracks", "e_color", DataType.STRING, NON_NULL),
        ("tracks", "e_count", DataType.INT64, NON_NULL),
        ("tracks", "e_score", DataType.FLOAT64, NON_NULL),
        ("tracks", "e_flag", DataType.BOOLEAN, NON_NULL),
        ("tracks", "e_when", DataType.DATETIME, NON_NULL),
        ("users", "ver", DataType.INT64, USERS_NON_NULL),  # non-null path
    ]
    for table, col, dt, non_null in cases:
        ours = ch.ddl_add_column(
            "ns", table, col, DT_TO_SPARK[dt], tuple(non_null)
        )
        ref = ref_add_column("ns", table, col, dt, non_null)
        assert norm(ours) == norm(ref), (table, col)
