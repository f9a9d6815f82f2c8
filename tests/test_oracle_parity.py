"""Mirror of the driver's correctness gate: every registered query
with an oracle must hash-match DuckDB on the same parquet tables."""

from __future__ import annotations

import pytest

from clickstreamtoclickhouse_spark import plans

from .conftest import SF_DIR
from .oracle_utils import assert_query_matches_oracle


@pytest.mark.parametrize("name", sorted(plans.ORACLE))
def test_query_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name, SF_DIR)


def test_all_queries_return_rows(spark):
    for name, fn in plans.QUERIES.items():
        n = fn(spark, SF_DIR).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
