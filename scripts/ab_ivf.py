#!/usr/bin/env python
"""Warm-session A/B for the IVF trainer checkpoint cadence."""
from __future__ import annotations
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F
from potpot_spark.catalog import load_table
from potpot_spark.operators.ivf import K_CELLS, N_ITERS, assign_cells, sq_dist
from potpot_spark.operators.similarity import as_double
from potpot_spark.session import get_session

SF = "/root/testdata/sf0.1"

def mat(df):
    df.write.format("noop").mode("overwrite").save()

def corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    return emb.select("vec_id", as_double(F.col("embedding")).alias("emb"))

def train(c, mode):
    c.cache()
    cents = (
        c.orderBy("vec_id").limit(K_CELLS)
        .select(F.row_number().over(Window.orderBy("vec_id")).alias("cell_id"),
                F.col("emb").alias("centroid"))
        .localCheckpoint()
    )
    for it in range(N_ITERS):
        assigned = assign_cells(c, cents)
        exploded = assigned.select("cell_id", F.posexplode("emb").alias("pos", "x"))
        dims = exploded.groupBy("cell_id", "pos").agg(
            (F.sum(F.col("x").cast("decimal(38,18)")) / F.count("x")).cast("double").alias("m"))
        cents = (dims.groupBy("cell_id")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                 .select("cell_id", F.transform("pm", lambda s: s.m).alias("centroid")))
        if mode == "current" or (mode == "final" and it == N_ITERS - 1) or \
           (mode == "every2" and (it % 2 == 1 or it == N_ITERS - 1)):
            cents = cents.localCheckpoint()
    c.unpersist()
    return cents

def main():
    spark = get_session("ab_ivf")
    spark.sparkContext.setLogLevel("ERROR")
    mat(spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count())
    mat(corpus(spark))
    times, outs = {}, {}
    for mode in ("current", "every2", "final"):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            mat(train(corpus(spark), mode))
            ts.append(time.perf_counter() - t0)
        times[mode] = ts
        outs[mode] = sorted(map(lambda r: (r[0], tuple(r[1])), train(corpus(spark), mode).collect()))
    for k, ts in times.items():
        print(k, [round(t, 2) for t in ts], "min", round(min(ts), 2))
    base = outs["current"]
    for k, v in outs.items():
        print(k, "identical:", v == base)

if __name__ == "__main__":
    main()
