"""Shared fixtures: one local SparkSession, a DuckDB oracle connection over
the same parquet fixtures, and a strict cross-engine comparator that mirrors
the driver's t2 gate (row count + column names + order-insensitive values),
but stricter: exact value equality after canonicalization."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from change_data_capture_service_spark.catalog import TABLE_NAMES, table_path
from change_data_capture_service_spark.session import get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cdc-engine-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    yield con
    con.close()


def _canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_val(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonicalize(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_val(v) for v in tup)
        for tup in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return cols, rows


def assert_query_matches_oracle(spark, duck, name: str, sf_dir: str):
    from change_data_capture_service_spark import registry

    entry = registry.get(name)
    assert entry.oracle is not None, f"{name} has no oracle (rows-only)"
    sdf = entry.fn(spark, sf_dir).toPandas()
    odf = duck.execute(entry.oracle).fetchdf()
    scols, srows = canonicalize(sdf)
    ocols, orows = canonicalize(odf)
    assert scols == ocols, f"{name}: column mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    if srows != orows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
