"""Driver-contract invariants over the whole registry.

The grading driver canonicalizes query output with a generic pandas
sort -- complex-typed columns (array/map/struct) crash it (r01:
agg_approx_percentile returned array<double> and its CORRECTNESS row was
a harness error instead of a pass). These tests pin the contract for
every registered query at plan-build time, so a regression fails CI
before it ever reaches the driver.
"""

from __future__ import annotations

import pytest

from change_data_capture_service_spark import registry

registry.load_all()

_SCALAR_TYPES = {
    "string",
    "long",
    "integer",
    "short",
    "byte",
    "double",
    "float",
    "boolean",
    "date",
    "timestamp",
    "timestamp_ntz",
    "decimal",
    "binary",
}


@pytest.fixture(scope="module")
def schemas(spark, sf_dir):
    out = {}
    for name, e in registry.entries().items():
        out[name] = e.fn(spark, sf_dir).schema  # plan build only, no execution
    return out


def test_every_output_column_is_scalar(schemas):
    offenders = {
        name: [f"{f.name}:{f.dataType.simpleString()}" for f in sch.fields
               if f.dataType.typeName() not in _SCALAR_TYPES]
        for name, sch in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, f"complex-typed outputs crash the driver canonicalizer: {offenders}"


def test_output_column_names_are_unique_and_nonempty(schemas):
    for name, sch in schemas.items():
        cols = [f.name for f in sch.fields]
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names {cols}"
        assert all(cols), f"{name}: empty column name"


def test_every_oracle_key_has_a_query(spark):
    qs, os_ = set(registry.queries()), set(registry.oracles())
    assert os_ <= qs, f"orphan oracles: {os_ - qs}"
