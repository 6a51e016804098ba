"""Simulate the grading driver: vanilla SparkSession -> __spark_entry__
entry() smoke + every queries()[k] vs oracle_sql()[k] in DuckDB at sf0.01.

Usage: python scripts/driver_sim.py [sf_dir] [key1 key2 ...]
With key args, only those queries run (entry smoke skipped).
Exit code != 0 on any mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def row_hash(pdf, cols):
    rows = sorted("|".join(map(str, t)) for t in pdf[cols].itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()[:12]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )  # deliberately vanilla: the driver does not apply engine confs
    import __spark_entry__ as E

    only = set(sys.argv[2:])
    if not only:
        n = E.entry(spark).count()
        print(f"entry rows: {n}")
        assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"  {name:28s} SPARK-ERROR {exc}")
            continue
        if name not in oracles:
            print(f"  {name:28s} {len(sdf):7d} rows-only")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"  {name:28s} ORACLE-ERROR {exc}")
            continue
        sc, oc = sorted(sdf.columns), sorted(odf.columns)
        ok = sc == oc and len(sdf) == len(odf) and row_hash(sdf, sc) == row_hash(odf, oc)
        if not ok:
            bad.append(name)
        print(f"  {name:28s} {len(sdf):7d} {'HASH-OK' if ok else 'MISMATCH'}")
    print(f"total={len(qs)} oracle-checked={len(oracles)} mismatches={len(bad)} {bad or ''}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
