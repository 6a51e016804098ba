"""The local mirror of the driver's t2 gate: every registered query that
declares a DuckDB oracle must match it exactly (columns, row count, values)
on the fixture tables. Queries without oracles get a rows-runnable check."""

from __future__ import annotations

import pytest

from change_data_capture_service_spark import registry
from tests.conftest import assert_query_matches_oracle

registry.load_all()
_ALL = sorted(registry.entries())
_WITH_ORACLE = [n for n in _ALL if registry.get(n).oracle is not None]
_ROWS_ONLY = [n for n in _ALL if registry.get(n).oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_duckdb_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, name, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.get(name).fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
