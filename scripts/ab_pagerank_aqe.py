#!/usr/bin/env python
"""Drained same-session A/B for VERDICT r11 #1: the pagerank kernels'
gated AQE-off (graph._narrow_loop) ON vs OFF at HEAD.

The r11 round wrapped graph_pagerank_fixed / graph_pagerank_personalized
in the narrow-width + AQE-off scope; the full-suite artifacts then
showed fixed's in-suite min moving 3.14 -> 5.75 s against a +10% drift
control, which the builder's single A/B (parity, 3.46 vs 3.45) could
not explain for the MIN.  This script settles it with a committed
artifact: REPS alternating reps per mode (interleaved so host drift
hits both arms equally), warm, with a cleaner drain + settle before
every rep, at the bench SF and session config.

The OFF arm monkeypatches graph._narrow_loop with a wrapper that forces
aqe_off=False while keeping the width pin — exactly the proposed revert
(keep width + finally hygiene, drop only the AQE toggle).

Usage: python scripts/ab_pagerank_aqe.py [reps_per_mode]  (default 4)
Writes scripts' stdout AND plans/r12/AB_PAGERANK_AQE.json.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potpot_spark import registry  # noqa: E402
from potpot_spark.session import get_session  # noqa: E402
import potpot_spark.operators.graph as G  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = ("graph_pagerank_fixed", "graph_pagerank_personalized")


def drain(spark, settle: float = 2.0) -> None:
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass
    time.sleep(settle)


def run_once(spark, name: str) -> float:
    spec = registry.specs()[name]
    t0 = time.perf_counter()
    spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_session("ab_pagerank_aqe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    orig_narrow = G._narrow_loop

    @contextlib.contextmanager
    def narrow_no_aqe_off(spark_, *, aqe_off, width=8):
        # same scope, AQE left ON — the proposed revert shape
        with orig_narrow(spark_, aqe_off=False, width=width):
            yield

    results: dict[str, dict[str, list[float]]] = {
        k: {"aqe_off_gated_HEAD": [], "aqe_on_forced": []} for k in KEYS
    }
    # one untimed warm rep per key (codegen, footer caches, edge build)
    for k in KEYS:
        run_once(spark, k)
    for r in range(reps):
        for k in KEYS:
            for mode in ("aqe_off_gated_HEAD", "aqe_on_forced"):
                G._narrow_loop = (
                    orig_narrow if mode == "aqe_off_gated_HEAD" else narrow_no_aqe_off
                )
                drain(spark)
                t = run_once(spark, k)
                results[k][mode].append(t)
                print(f"rep {r} {k:32s} {mode:22s} {t:7.3f} s", flush=True)
    G._narrow_loop = orig_narrow
    out = {
        "sf_dir": SF_DIR,
        "reps_per_mode": reps,
        "protocol": "interleaved modes, System.gc()+2s drain before every rep, warm",
        "results": results,
        "medians": {
            k: {
                m: sorted(v)[len(v) // 2] if len(v) % 2 else round(
                    (sorted(v)[len(v) // 2 - 1] + sorted(v)[len(v) // 2]) / 2, 3
                )
                for m, v in modes.items()
            }
            for k, modes in results.items()
        },
        "mins": {
            k: {m: min(v) for m, v in modes.items()} for k, modes in results.items()
        },
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12", "AB_PAGERANK_AQE.json",
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["medians"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
