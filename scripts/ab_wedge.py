#!/usr/bin/env python
"""A/B harness for graph_wedge_sample_clustering pair-assembly shapes.

Current shape: full window (rank + count-over-partition) then a rank
self-join for pair assembly.  Variants under test (r10 verdict #4):

  V1  same window, filter rk <= 2k, then ONE groupBy(c, d) with
      conditional max(when(rk = i)) columns replaces the self-join —
      pair assembly rides the window's existing partitioning, no
      second sort of the 2.4M-row adjacency.
  V2  degree via a separate map-side groupBy (partial agg) + a
      rank-only window behind a rk <= 2k filter (WindowGroupLimit
      prunes the per-partition sort), deg joined back on c.

Each variant must produce the IDENTICAL 1-row result.  Usage:
    python scripts/ab_wedge.py [runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from potpot_spark import registry
from potpot_spark.operators.graph import part_copurchase_edges
from potpot_spark.functions.numeric import phash60
from potpot_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 2  # WEDGE_SAMPLES_PER_NODE


def _finish(edges: DataFrame, wedges: DataFrame) -> DataFrame:
    checked = (
        wedges.join(
            edges.withColumn("hit", F.lit(1)),
            (wedges["n1"] == edges["u"]) & (wedges["n2"] == edges["v"]),
            "left",
        )
        .groupBy("c", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sampled"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("closed"),
        )
    )
    wv = (F.col("d") * (F.col("d") - 1) / 2).cast("bigint")
    num2 = wv * F.col("closed") * F.when(F.col("sampled") == 1, 2).otherwise(1)
    return checked.agg(
        F.sum("sampled").cast("bigint").alias("n_sampled_wedges"),
        F.sum("closed").cast("bigint").alias("n_closed"),
        F.sum(wv).cast("bigint").alias("total_wedges"),
        F.sum(num2).cast("bigint").alias("est_num2"),
        F.round(F.sum(num2).cast("double") / 2 / F.sum(wv), 6).alias(
            "est_transitivity"
        ),
    )


def _pairs_from_top(top: DataFrame) -> DataFrame:
    """top: (c[, d], nbr, rk<=2K) -> exploded (c, n1, n2) wedge rows."""
    keys = ["c"] + (["d"] if "d" in top.columns else [])
    agg = top.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("rk") == i, F.col("nbr"))).alias(f"r{i}")
            for i in range(1, 2 * K + 1)
        ]
    )
    pairs = agg.select(
        *keys,
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(
                            F.col(f"r{2 * i + 2}").isNotNull(),
                            F.struct(
                                F.least(
                                    F.col(f"r{2 * i + 1}"), F.col(f"r{2 * i + 2}")
                                ).alias("n1"),
                                F.greatest(
                                    F.col(f"r{2 * i + 1}"), F.col(f"r{2 * i + 2}")
                                ).alias("n2"),
                            ),
                        )
                        for i in range(K)
                    ]
                ),
                lambda s: s.isNotNull(),
            )
        ).alias("w"),
    )
    return pairs.select(*keys, F.col("w.n1").alias("n1"), F.col("w.n2").alias("n2"))


def v1(spark, sf_dir: str) -> DataFrame:
    edges = part_copurchase_edges(spark, sf_dir)
    adj = edges.select(F.col("u").alias("c"), F.col("v").alias("nbr")).union(
        edges.select(F.col("v").alias("c"), F.col("u").alias("nbr"))
    )
    w_rank = Window.partitionBy("c").orderBy(phash60(F.col("nbr").cast("string")), "nbr")
    ranked = adj.select(
        "c",
        "nbr",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("c")).alias("d"),
    ).where(F.col("rk") <= 2 * K)
    return _finish(edges, _pairs_from_top(ranked))


def v2(spark, sf_dir: str) -> DataFrame:
    edges = part_copurchase_edges(spark, sf_dir)
    adj = edges.select(F.col("u").alias("c"), F.col("v").alias("nbr")).union(
        edges.select(F.col("v").alias("c"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    w_rank = Window.partitionBy("c").orderBy(phash60(F.col("nbr").cast("string")), "nbr")
    top = adj.select(
        "c", "nbr", F.row_number().over(w_rank).alias("rk")
    ).where(F.col("rk") <= 2 * K)
    pairs = _pairs_from_top(top).join(deg, "c")
    return _finish(edges, pairs)


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session("ab_wedge")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    cur = registry.specs()["graph_wedge_sample_clustering"].fn
    base_rows = cur(spark, SF_DIR).collect()
    for name, fn in (("v1", v1), ("v2", v2)):
        rows = fn(spark, SF_DIR).collect()
        same = [tuple(r) for r in rows] == [tuple(r) for r in base_rows]
        print(f"{name} equal={same}  rows={rows}")
        if not same:
            print(f"  base={base_rows}")
    for name, fn in (("cur", cur), ("v1", v1), ("v2", v2)):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in ts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
