"""Catalog contract: the declared schemas (the engine's relation registry,
R2/R11) must match what the fixture parquet actually contains, for every
table and scale factor the suite runs at."""

from __future__ import annotations

import pytest

from change_data_capture_service_spark.catalog import (
    PRIMARY_KEYS,
    SCHEMAS,
    TABLE_NAMES,
    load_table,
)


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_matches_declared_schema(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    got = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
    want = {(f.name, f.dataType.simpleString()) for f in SCHEMAS[name].fields}
    assert got == want, f"{name}: {got ^ want}"


@pytest.mark.parametrize("name", [n for n in TABLE_NAMES if n in PRIMARY_KEYS])
def test_declared_pk_is_unique(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    pk = PRIMARY_KEYS[name]
    assert df.count() == df.select(*pk).distinct().count(), f"{name} PK {pk} not unique"


def test_lineitem_has_no_unique_key(spark, sf_dir):
    """Documents why lineitem has no declared PK: the fixture contains
    fully-duplicate rows (bag semantics)."""
    df = load_table(spark, sf_dir, "lineitem")
    assert df.count() > df.distinct().count() or "lineitem" not in PRIMARY_KEYS


def test_minmax_by_comparator_is_tie_free(duck):
    """agg_minmax_by's docstring promises its comparator (o_totalprice
    within o_custkey) has no ties at fixture scale -- arg_max/max_by are
    both nondeterministic under ties, so parity would be luck otherwise."""
    n = duck.execute(
        "SELECT max(c) FROM (SELECT o_custkey, o_totalprice, count(*) AS c"
        " FROM orders GROUP BY 1, 2)"
    ).fetchone()[0]
    assert n == 1
