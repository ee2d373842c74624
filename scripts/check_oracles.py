#!/usr/bin/env python
"""Fast local oracle sweep: run every registered query against its
DuckDB oracle and print one line per query.  Usage:

    python scripts/check_oracles.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from potpot_spark import registry
from potpot_spark.session import get_session
from potpot_spark.testing import compare_query, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_session("potpot_check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    registry.load_all()
    failures = 0
    for name, spec in registry.specs().items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, spec, sf_dir, con=con)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[ERROR] {name}: {type(e).__name__}: {str(e).splitlines()[0][:300]}")
            continue
        if not res.ok:
            failures += 1
        print(f"{res}  ({time.time() - t0:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
