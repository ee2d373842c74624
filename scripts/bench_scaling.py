#!/usr/bin/env python
"""Two-scale scaling proof (r10 verdict #3): measure the top-cost
cohort at sf0.1 AND at the generated sf1 (10x rows,
scripts/gen_scale_fixtures.py) and record sec(sf1)/sec(sf0.1) per
query in BENCH_SCALING.json.  Every 100 TB claim in this repo was
plan-shape reasoning below sf0.1; this converts "survives 100x" from
argument to measurement: a near-linear plan lands <= ~12x (10x data
plus fixed overhead amortization keeps most UNDER 10x), and anything
super-linear is a finding that gets a PLANS.md entry.

Protocol: per sf_dir, REPS warm reps per query through the noop sink
(median recorded; the first rep absorbs shared-intermediate builds,
which the median discards).  A query whose FIRST sf1 rep exceeds
REP_CAP_SEC records that single rep and moves on — a 10x fixture that
blows past the cap is itself the datum.  Queries are run in the same
order at both scales.

Usage: python scripts/bench_scaling.py [--top N] [--reps K] [names...]
"""
from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potpot_spark import registry
from potpot_spark.session import get_session

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_BIG = os.environ.get(
    "SPARK_GRAFT_SF_BIG_DIR", "/root/repo/fixtures/sf1"
)
REP_CAP_SEC = 240.0


def newest_detail() -> tuple[str, dict]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    for p in glob.glob(os.path.join(here, "BENCH_DETAIL_r[0-9]*.json")):
        m = re.match(r"BENCH_DETAIL_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return "", {}
    _, path = max(rounds)
    with open(path) as f:
        return os.path.basename(path), json.load(f).get("queries", {})


def effective(t: dict) -> float:
    if t.get("isolated") is not None:
        return max(
            min(t["isolated"], t.get("median", t["isolated"])),
            t.get("min", -1.0),
        )
    return t.get("median", -1.0)


def mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    top_n = 25
    reps = 3
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    spark = get_session("potpot_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    if args:
        names = [n for n in args if n in registry.specs()]
    else:
        detail_source, detail = newest_detail()
        ranked = sorted(
            ((effective(t), n) for n, t in detail.items() if n in registry.specs()),
            reverse=True,
        )
        names = sorted(n for _, n in ranked[:top_n])
    mat(
        spark.range(100_000)
        .selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k")
        .sum("v")
    )
    out: dict[str, dict] = {}
    for sf_key, sf_dir in (("sf0.1", SF_SMALL), ("sf1", SF_BIG)):
        if not os.path.isdir(sf_dir):
            print(f"# missing {sf_dir}; run scripts/gen_scale_fixtures.py",
                  file=sys.stderr)
            return 1
        for name in names:
            spec = registry.get(name)
            ts: list[float] = []
            err = None
            # rep 0 is an UNRECORDED warmup (shared-intermediate builds
            # + cold-cache spill land there, not in the median — the
            # first artifact's C4 entry mixed a 251 s cold rep into a
            # 78 s warm steady state) unless it blows the cap, in
            # which case the cold rep IS the datum and is recorded.
            for r in range(reps + 1):
                t0 = time.time()
                try:
                    mat(spec.fn(spark, sf_dir))
                except Exception as e:  # noqa: BLE001 - DNF is a datum
                    err = f"{type(e).__name__}: {str(e)[:200]}"
                    break
                dt = time.time() - t0
                if r > 0 or dt > REP_CAP_SEC:
                    ts.append(dt)
                if dt > REP_CAP_SEC:
                    break
            ent = out.setdefault(name, {})
            if ts:
                ent[sf_key] = round(statistics.median(ts), 3)
                ent[f"{sf_key}_reps"] = len(ts)
            if err:
                ent[f"{sf_key}_error"] = err
            print(f"# {sf_key} {name}: {ent.get(sf_key)}", file=sys.stderr)
    for name, ent in out.items():
        a, b = ent.get("sf0.1"), ent.get("sf1")
        if a and b and a > 0:
            ent["ratio"] = round(b / a, 2)
    record = {
        "protocol": (
            f"one unrecorded warmup rep, then median of <= {reps} warm "
            f"noop-sink reps per scale; "
            f"sf1 = 10x key-offset replicas (scripts/gen_scale_fixtures.py); "
            f"any rep > {REP_CAP_SEC:.0f}s is recorded and short-circuits"
        ),
        "sf_small": SF_SMALL,
        "sf_big": SF_BIG,
        "queries": out,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "BENCH_SCALING.json")
    if args and os.path.exists(out_path):
        # incremental mode (mirrors bench_vs_duckdb --only): explicit
        # names re-measure and MERGE into the existing artifact; prior
        # entries for untouched queries survive.  Per-entry `measured`
        # tags keep provenance honest when a partial refresh follows a
        # code change.
        with open(out_path) as f:
            prior_record = json.load(f)
        merged = prior_record.get("queries", {})
        for k in merged:
            merged[k].setdefault("measured", "prior-run")
        for k, v in out.items():
            v["measured"] = "this-run"
            merged[k] = v
        record["queries"] = merged
        record["prior_protocol"] = prior_record.get("protocol")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    ratios = sorted(
        (e["ratio"], n) for n, e in out.items() if "ratio" in e
    )
    print(json.dumps({
        "queries_measured": len(ratios),
        "median_ratio": statistics.median(r for r, _ in ratios) if ratios else -1,
        "max_ratio": ratios[-1] if ratios else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
