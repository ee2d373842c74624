#!/usr/bin/env python
"""Warm A/B: random-walk adjacency broadcast + BFS checkpoint cadence."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from potpot_spark.operators.graph import (
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    WALK_HASH_P,
    WALK_SAMPLE_MOD,
    WALK_STEPS,
    part_copurchase_edges,
)
from potpot_spark.session import get_session

SF = "/root/testdata/sf0.1"


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def walk_current(spark):
    edges = part_copurchase_edges(spark, SF)
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = und.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs"),
        F.count(F.lit(1)).cast("bigint").alias("deg"),
    )
    walk = adj.where(F.col("u") % WALK_SAMPLE_MOD == 0).select(
        F.col("u").alias("start"), F.col("u").alias("cur")
    )
    for k in range(1, WALK_STEPS + 1):
        a = adj.select(
            F.col("u").alias("_au"), F.col("nbrs").alias("_nbrs"), F.col("deg").alias("_deg")
        )
        idx = (
            (F.col("cur") * F.lit(2654435761) + F.lit(k * 97)) % WALK_HASH_P
            % F.col("_deg")
            + 1
        ).cast("int")
        walk = walk.join(a, walk.cur == a._au).select(
            "start", F.element_at("_nbrs", idx).alias("cur")
        )
    return walk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_walks"),
        F.countDistinct("cur").cast("bigint").alias("n_distinct_endpoints"),
        F.sum("cur").cast("bigint").alias("endpoint_checksum"),
        F.sum(F.when(F.col("cur") == F.col("start"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned_home"),
    )


def walk_bcast(spark):
    edges = part_copurchase_edges(spark, SF)
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = und.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs"),
        F.count(F.lit(1)).cast("bigint").alias("deg"),
    ).localCheckpoint(eager=True)
    walk = adj.where(F.col("u") % WALK_SAMPLE_MOD == 0).select(
        F.col("u").alias("start"), F.col("u").alias("cur")
    )
    for k in range(1, WALK_STEPS + 1):
        a = adj.select(
            F.col("u").alias("_au"), F.col("nbrs").alias("_nbrs"), F.col("deg").alias("_deg")
        )
        idx = (
            (F.col("cur") * F.lit(2654435761) + F.lit(k * 97)) % WALK_HASH_P
            % F.col("_deg")
            + 1
        ).cast("int")
        walk = walk.join(F.broadcast(a), walk.cur == a._au).select(
            "start", F.element_at("_nbrs", idx).alias("cur")
        )
    return walk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_walks"),
        F.countDistinct("cur").cast("bigint").alias("n_distinct_endpoints"),
        F.sum("cur").cast("bigint").alias("endpoint_checksum"),
        F.sum(F.when(F.col("cur") == F.col("start"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned_home"),
    )


def bfs(spark, eager):
    edges = part_copurchase_edges(spark, SF)
    sym = (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .withColumnRenamed("u", "src")
        .withColumnRenamed("v", "dst")
        .persist()
    )
    dist = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .where(F.col("node") % BFS_SEED_MOD == 0)
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for hop in range(1, BFS_MAX_HOPS + 1):
        neighbors = (
            F.broadcast(frontier).join(sym, frontier.node == sym.src)
            .select(F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new = neighbors.join(
            F.broadcast(dist.select("node")), "node", "left_anti"
        ).localCheckpoint(eager=eager)
        dist = dist.union(new)
        frontier = new
    sym.unpersist()
    return (
        dist.groupBy(F.col("dist").cast("int").alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .orderBy("dist")
    )


def main():
    spark = get_session("ab_graph")
    spark.sparkContext.setLogLevel("ERROR")
    mat(spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count())
    mat(part_copurchase_edges(spark, SF))
    variants = {
        "walk_current": walk_current,
        "walk_bcast": walk_bcast,
        "bfs_eager": lambda s: bfs(s, True),
        "bfs_lazy": lambda s: bfs(s, False),
    }
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn(spark))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(k, [round(t, 2) for t in ts], "min", round(min(ts), 2))
    print("walk identical:", walk_current(spark).collect() == walk_bcast(spark).collect())
    print("bfs identical:", bfs(spark, True).collect() == bfs(spark, False).collect())


if __name__ == "__main__":
    main()
