"""File-format round-trips through the catalog-schema'd source helpers."""

from __future__ import annotations

from change_data_capture_service_spark.catalog import load_table
from change_data_capture_service_spark.sources.files import read_table_any, write_table


def test_csv_json_orc_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    want = sorted(tuple(r) for r in src.collect())
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / f"customer_{fmt}")
        write_table(src, path, fmt=fmt)
        back = read_table_any(spark, path, "customer", fmt=fmt)
        assert back.schema == src.schema or fmt == "csv"  # csv loses nullability only
        got = sorted(tuple(r) for r in back.collect())
        assert got == want, fmt


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from change_data_capture_service_spark.plans.inspect import formatted_plan

    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_table(src, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter("o_orderstatus = 'F'")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan  # partition pruning engaged, not a full scan
    assert back.count() > 0
