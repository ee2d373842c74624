#!/usr/bin/env python
"""Profile one registered query: N back-to-back warm runs, per-run wall
times printed (not just median/min), optional explain.  Usage:

    python scripts/profile_one.py <query_name> [runs] [--explain]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potpot_spark import registry
from potpot_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 5
    spark = get_session("potpot_profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    spec = registry.specs()[name]
    if "--explain" in sys.argv:
        spec.fn(spark, SF_DIR).explain("formatted")
    for i in range(runs):
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.perf_counter() - t0:.3f} s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
