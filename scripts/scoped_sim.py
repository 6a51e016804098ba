"""Scoped driver-simulation: verify named keys against the DuckDB oracle
at sf0.001 + sf0.01, exactly the way the grading driver does.

    python scripts/scoped_sim.py key1 key2 ...

The full-surface run (scripts in .claude/skills/verify) is still required
at least once per session; this is the fast inner loop for new keys.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("scoped-sim")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print("unknown keys:", unknown)
        return 2
    bad = 0
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        print("==", sf)
        for name in keys:
            try:
                sdf = qs[name](spark, sf).toPandas()
            except Exception as ex:
                print(f"  {name:44s} ERROR {type(ex).__name__}: {str(ex)[:200]}")
                bad += 1
                continue
            if name not in os_:
                print(f"  {name:44s} {len(sdf):6d} rows-only")
                continue
            try:
                odf = con.execute(os_[name]).fetchdf()
            except Exception as ex:
                print(f"  {name:44s} ORACLE-ERR {str(ex)[:200]}")
                bad += 1
                continue

            def h(p, c):
                if len(p) == 0:
                    return "EMPTY"
                s = p[c].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
                return hashlib.md5("\n".join(s).encode()).hexdigest()[:10]

            sc, oc = sorted(sdf.columns), sorted(odf.columns)
            ok = sc == oc and len(sdf) == len(odf) and h(sdf, sc) == h(odf, oc)
            if not ok:
                bad += 1
                detail = ""
                if sc != oc:
                    detail = f" cols spark={sc} oracle={oc}"
                elif len(sdf) != len(odf):
                    detail = f" rows spark={len(sdf)} oracle={len(odf)}"
                print(f"  {name:44s} {len(sdf):6d} MISMATCH{detail}")
            else:
                print(f"  {name:44s} {len(sdf):6d} HASH-OK")
    print("TOTAL-BAD", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
