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


def test_write_clustered_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range-clustered output: each parquet file owns a disjoint o_custkey
    range (this is what lets row-group stats prune scans), and a key filter
    on the result reads fewer files than a full scan."""
    import pyarrow.parquet as pq

    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.sources.files import write_clustered

    out = str(tmp_path / "clustered")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered(orders, out, ["o_custkey"], num_files=8)

    ranges = []
    import glob as g

    for f in sorted(g.glob(f"{out}/part-*.parquet")):
        t = pq.read_table(f, columns=["o_custkey"])
        col = t.column("o_custkey").to_pylist()
        if col:
            ranges.append((min(col), max(col)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"

    # and the round-trip preserves the data
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
