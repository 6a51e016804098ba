"""Measured shuffle budgets for the headline + extended suites.

    python scripts/shuffle_audit.py [sf_dir]

For each query: rows scanned at the sources vs records/bytes written to
shuffles vs rows output -- the ground truth behind SCALE.md's
shuffle-budget table. A partial-aggregating plan shows shuffle records
close to |groups| regardless of scan size; a plan that shuffles its scan
would show the two numbers converge (and fail review).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ("numOutputRows", "shuffleRecordsWritten", "shuffleBytesWritten")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from bench import EXTENDED, HEADLINE
    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.plans.inspect import executed_metrics
    from change_data_capture_service_spark.session import get_spark

    spark = get_spark(app_name="shuffle-audit")
    registry.load_all()

    # round-5-late ops with sharp budget claims, audited alongside the suites
    extra = (
        "events_entry_paths_topk",    # rank-limit: <= 3 rows/user + path rollup
        "attribution_last_touch",     # one as-of window shuffle + |sources| agg
        "quality_perplexity_unigram", # (doc,tok) + vocab-grain model exchanges
        "tpch_q16_supplier_count_by_part",  # distinct pair reduction only
        "dedup_containment_pairs",    # shared-shingle candidates, never text
    )
    names = [k for _, k in HEADLINE] + list(EXTENDED) + list(extra)
    print(f"| query | shuffle records | shuffle bytes | result rows |")
    print(f"|---|---|---|---|")
    for key in names:
        df = registry.get(key).fn(spark, sf_dir)
        rows = df.collect()
        m = executed_metrics(df, KEYS)
        print(
            f"| {key} | {m['shuffleRecordsWritten']:,} |"
            f" {m['shuffleBytesWritten']:,} | {len(rows):,} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
