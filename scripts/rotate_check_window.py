"""Compute the next driver check window from the CORRECTNESS history.

    python scripts/rotate_check_window.py [--window 50]

The grading driver verifies keys in `registry.entries()` iteration order
under a bounded per-round budget (50 keys). Each round the attested window
rotates out and never-attested keys move to the front. This script makes
that rotation mechanical and error-proof:

1. scans every CORRECTNESS_r*.json in the repo root for keys with a clean
   row (rows_match, and hash_match when an oracle exists);
2. partitions the registry into attested / never-attested;
3. prints the recommended new `_CHECK_ORDER` front (never-attested first,
   in registration order, truncated to the window) as a paste-ready Python
   list, plus the matching pinned-window list for
   `tests/test_driver_contract.py`;
4. exits non-zero if the CURRENT front window still contains
   never-attested keys (i.e., rotating now would discard pending
   attestation slots -- rotate only after the round's CORRECTNESS lands).

It never rewrites files: the registry comment block carries design notes
that deserve human eyes, so the output is meant to be pasted.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def attested_keys(root: str) -> set[str]:
    """Keys with a clean driver row in ANY round's CORRECTNESS file."""
    good: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle":
                # rows-only-by-design: attested when the query ran clean
                # and produced a row count for the driver to record.
                if row.get("spark_rows") is not None:
                    good.add(key)
                continue
            if err:
                continue
            if row.get("rows_match") and row.get("hash_match", True):
                good.add(key)
    return good


def main() -> int:
    window = 50
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from change_data_capture_service_spark import registry

    registry.load_all()
    all_keys = list(registry.entries())
    good = attested_keys(root)
    never = [k for k in all_keys if k not in good]

    current_front = all_keys[:window]
    pending = [k for k in current_front if k not in good]

    print(f"registered: {len(all_keys)}  attested-ever: {len(good)}  "
          f"never-attested: {len(never)}")
    if pending:
        print(f"\nCURRENT window still has {len(pending)} unattested keys "
              f"(this round's CORRECTNESS has not landed yet -- do not "
              f"rotate):")
        for k in pending:
            print(f"  {k}")
        return 1

    front = never[:window]
    print(f"\nnew _CHECK_ORDER front ({len(front)} keys; "
          f"{max(0, window - len(front))} free slots for new operators):")
    print("_CHECK_ORDER = [")
    for k in front:
        print(f'    "{k}",')
    print("]")
    print("\npinned list for tests/test_driver_contract.py "
          "(_R?_CHECK_WINDOW): same keys, same order.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
