#!/usr/bin/env python
"""Recorded Spark-vs-DuckDB comparison (BASELINE.md protocol line
"sanity-compare against DuckDB on the same machine", promised since r1,
executed-and-recorded per r6 verdict #3).

For the 22 TPC-H-shaped queries (Q1 = the flagship agg_hash_groupby)
plus the 10 slowest suite queries that carry DuckDB value oracles, run
BOTH engines on the SAME sf0.1 parquet on the SAME machine:

- Spark: the registered query on local[$SPARK_GRAFT_CPUS] through the
  noop sink (full materialization, no driver transfer), 3 warm reps.
- DuckDB: the query's own oracle SQL (the independently-authored ANSI
  twin every result is value-checked against) with threads matching,
  materialized via fetchall, 3 warm reps.

Writes BENCH_VS_DUCKDB.json and prints a markdown table for SURVEY §6 /
BASELINE.md.  Protocol note for the reader: DuckDB runs the ORACLE
formulation — written for bit-exact adjudication, not speed (e.g.
recursive-CTE unrolls for iterative kernels) — so on the iterative /
procedural queries the comparison bounds the declarative-SQL cost of
the semantics, while on the TPC-H 22 both formulations are the natural
relational plan and the numbers are directly comparable.

Usage: python scripts/bench_vs_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potpot_spark import registry
from potpot_spark.session import get_session
from potpot_spark.testing import duck_connection

REPS = 3

# The 10 slowest oracle-carrying queries of the r6 final bench, by
# in-suite median (BENCH_DETAIL_r06_final.json), streaming sources
# excluded (DuckDB has no streaming runtime to compare against).
SLOW10 = [
    "text_trigram_name_similarity",
    "graph_harmonic_centrality",
    "embedding_hubness_knn_graph",
    "sql_api_recursive_cte",
    "timeseries_croston_intermittent",
    "graph_hits_hubs_authorities",
    "graph_pagerank_fixed",
    "graph_scc_condensation",
    "stats_spearman_rank_corr",
    "graph_pagerank_personalized",
]


def mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("potpot_vs_duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    con = duck_connection(sf_dir)
    try:
        con.execute(f"SET threads TO {int(cpus)}")
    except Exception:
        pass

    keys = ["agg_hash_groupby"] + sorted(
        n for n in registry.specs() if n.startswith("tpch_")
    ) + SLOW10

    # Spark warmup (bench.py's rationale: JIT + codegen + noop path).
    mat(spark.range(100_000).selectExpr("id % 7 AS k", "id AS v").groupBy("k").sum("v"))

    out: dict[str, dict] = {}
    for name in keys:
        spec = registry.get(name)
        spark_times, duck_times = [], []
        for _ in range(REPS):
            t0 = time.time()
            mat(spec.fn(spark, sf_dir))
            spark_times.append(time.time() - t0)
        for _ in range(REPS):
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            duck_times.append(time.time() - t0)
        out[name] = {
            "spark_median": round(statistics.median(spark_times), 3),
            "spark_min": round(min(spark_times), 3),
            "duckdb_median": round(statistics.median(duck_times), 3),
            "duckdb_min": round(min(duck_times), 3),
        }
        print(
            f"# {name}: spark {out[name]['spark_median']}s "
            f"duckdb {out[name]['duckdb_median']}s",
            file=sys.stderr,
        )

    payload = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps": REPS,
        "queries": out,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_VS_DUCKDB.json"), "w") as f:
        json.dump(payload, f, indent=1)

    print("| query | spark med (s) | duckdb med (s) | spark/duckdb |")
    print("|---|---|---|---|")
    for name, r in out.items():
        ratio = (
            round(r["spark_median"] / r["duckdb_median"], 2)
            if r["duckdb_median"] > 0
            else float("inf")
        )
        print(
            f"| {name} | {r['spark_median']} | {r['duckdb_median']} | {ratio} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
