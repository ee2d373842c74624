#!/usr/bin/env python
"""Warm-session A/B for the PQ trainer: per-iter localCheckpoint vs
final-only vs driver-collected centroids."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.operators.ivf import M_SUB, PQ_ITERS, PQ_K, _subvectors, sq_dist
from potpot_spark.operators.similarity import as_double
from potpot_spark.session import get_session

SF = "/root/testdata/sf0.1"


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def corpus_sub(spark):
    emb = load_table(spark, SF, "embeddings")
    corpus = emb.select("vec_id", as_double(F.col("embedding")).alias("emb"))
    return _subvectors(corpus).select("m", "vec_id", "sub")


def train(cs, mode):
    cs.cache()
    w = Window.partitionBy("m").orderBy("vec_id")
    cents = (
        cs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= PQ_K)
        .select("m", F.col("rn").alias("code"), F.col("sub").alias("centroid"))
    )
    if mode != "nockpt":
        cents = cents.localCheckpoint()
    for it in range(PQ_ITERS):
        scored = cs.join(F.broadcast(cents), "m").select(
            "m", "vec_id", "sub", "code",
            sq_dist(F.col("sub"), F.col("centroid")).alias("d2"),
        )
        assigned = (
            scored.groupBy("m", "vec_id")
            .agg(F.min(F.struct("d2", "code")).alias("_b"), F.first("sub").alias("sub"))
            .select("m", "vec_id", F.col("_b.code").alias("code"), "sub")
        )
        dims = (
            assigned.select("m", "code", F.posexplode("sub").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(
                (F.sum(F.col("x").cast("decimal(38,18)")) / F.count("x"))
                .cast("double")
                .alias("v")
            )
        )
        cents = (
            dims.groupBy("m", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select("m", "code", F.transform("pv", lambda s: s.v).alias("centroid"))
        )
        if mode == "current" or (mode == "final" and it == PQ_ITERS - 1):
            cents = cents.localCheckpoint()
        elif mode == "driver":
            rows = cents.collect()
            cents = cents.sparkSession.createDataFrame(rows, cents.schema)
    cs.unpersist()
    return cents


def main():
    spark = get_session("ab_pq")
    spark.sparkContext.setLogLevel("ERROR")
    mat(spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count())
    cs = corpus_sub(spark)
    mat(cs)
    times = {}
    outs = {}
    for mode in ("current", "final", "driver", "nockpt"):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = train(corpus_sub(spark), mode)
            mat(c)
            ts.append(time.perf_counter() - t0)
        times[mode] = ts
        outs[mode] = sorted(map(lambda r: (r[0], r[1], tuple(r[2])), train(corpus_sub(spark), mode).collect()))
    for k, ts in times.items():
        print(k, [round(t, 2) for t in ts], "min", round(min(ts), 2))
    base = outs["current"]
    for k, v in outs.items():
        print(k, "identical:", v == base)


if __name__ == "__main__":
    main()
