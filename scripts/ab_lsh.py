#!/usr/bin/env python
"""Warm-session A/B for sim_search_lsh_bucketed variants."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.operators.similarity import (
    N_PLANES,
    N_QUERIES,
    N_TABLES,
    TOP_K,
    _hyperplane,
    _with_table_buckets,
    as_double,
    cosine,
)
from potpot_spark.session import get_session

SF = "/root/testdata/sf0.1"
DIM = 64


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def finish(candidates):
    scored = candidates.select(
        "query_id", "vec_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cosine"), "rnk")
    )


def v_current(spark):
    emb = load_table(spark, SF, "embeddings")
    corpus = _with_table_buckets(
        emb.select("vec_id", as_double(F.col("embedding")).alias("c_emb")),
        "vec_id", "c_emb", DIM,
    )
    queries_df = F.broadcast(
        _with_table_buckets(
            emb.where(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                as_double(F.col("embedding")).alias("q_emb"),
            ),
            "query_id", "q_emb", DIM,
        )
    )
    candidates = (
        queries_df.join(corpus, ["tbl", "bucket"])
        .select("query_id", "q_emb", "vec_id", "c_emb")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return finish(candidates)


def _planes_lit():
    return F.array(*[
        F.array(*[F.lit(c) for c in _hyperplane(DIM, t * N_PLANES + p)])
        for t in range(N_TABLES)
        for p in range(N_PLANES)
    ])


def _buckets_one_pass(df, id_col, emb_col):
    """All 24 projections via ONE transform over a literal plane matrix
    (identical left-fold arithmetic), then per-table sign-bit packing."""
    projs = F.transform(
        _planes_lit(),
        lambda pl: F.aggregate(
            F.zip_with(F.col(emb_col), pl, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    d = df.select(id_col, emb_col, projs.alias("projs"))
    entries = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            sum(
                (F.when(F.col("projs")[t * N_PLANES + p] > 0, F.lit(1 << p)).otherwise(F.lit(0)))
                for p in range(N_PLANES)
            ).alias("bucket"),
        )
        for t in range(N_TABLES)
    ])
    return d.select(id_col, emb_col, F.explode(entries).alias("e")).select(
        id_col, emb_col, F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket")
    )


def v_onepass(spark):
    emb = load_table(spark, SF, "embeddings")
    corpus = _buckets_one_pass(
        emb.select("vec_id", as_double(F.col("embedding")).alias("c_emb")),
        "vec_id", "c_emb",
    )
    queries_df = F.broadcast(
        _buckets_one_pass(
            emb.where(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                as_double(F.col("embedding")).alias("q_emb"),
            ),
            "query_id", "q_emb",
        )
    )
    candidates = (
        queries_df.join(corpus, ["tbl", "bucket"])
        .select("query_id", "q_emb", "vec_id", "c_emb")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return finish(candidates)


def main():
    spark = get_session("ab_lsh")
    spark.sparkContext.setLogLevel("ERROR")
    mat(spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count())
    mat(load_table(spark, SF, "embeddings"))
    variants = {"current": v_current, "onepass": v_onepass}
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn(spark))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(k, [round(t, 2) for t in ts], "min", round(min(ts), 2))
    # cross-check identical output
    a = sorted(map(tuple, v_current(spark).collect()))
    b = sorted(map(tuple, v_onepass(spark).collect()))
    print("identical:", a == b, len(a), len(b))


if __name__ == "__main__":
    main()
