#!/usr/bin/env python
"""Warm-session A/B harness for text_trigram_name_similarity variants."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.session import get_session

SF = "/root/testdata/sf0.1"
TRGM_MIN_SIM_U = 300000
TRGM_TOP = 25


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def names_df(spark):
    p = load_table(spark, SF, "part").where(F.length("p_name") >= 3)
    return p.select(
        "p_partkey",
        "p_brand",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, length(lower(p_name)) - 2), "
                "i -> substring(lower(p_name), i, 3))"
            )
        ).alias("trgms"),
    )


def postings_df(spark):
    return names_df(spark).select(
        "p_partkey",
        "p_brand",
        F.size("trgms").alias("sz"),
        F.explode("trgms").alias("trgm"),
    )


def finish(counted):
    sim_u = F.floor(
        F.col("n_common").cast("double") * 1000000 / F.col("n_union")
    ).cast("bigint")
    return (
        counted.select(
            "id_a",
            "id_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
            .cast("bigint")
            .alias("n_union"),
        )
        .select("id_a", "id_b", "n_common", sim_u.alias("sim_u"))
        .where(F.col("sim_u") >= TRGM_MIN_SIM_U)
        .orderBy(F.col("sim_u").desc(), "id_a", "id_b")
        .limit(TRGM_TOP)
    )


def v_current(spark):
    postings = postings_df(spark)
    a = postings.select(
        "p_brand", "trgm", F.col("p_partkey").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = postings.select(
        "p_brand", "trgm", F.col("p_partkey").alias("id_b"), F.col("sz").alias("sz_b")
    )
    counted = (
        a.join(b, ["p_brand", "trgm"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return finish(counted)


def v_sizefilter(spark):
    postings = postings_df(spark)
    a = postings.select(
        "p_brand", "trgm", F.col("p_partkey").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = postings.select(
        "p_brand", "trgm", F.col("p_partkey").alias("id_b"), F.col("sz").alias("sz_b")
    )
    counted = (
        a.join(b, ["p_brand", "trgm"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_a") * 10 >= F.col("sz_b") * 3)
            & (F.col("sz_b") * 10 >= F.col("sz_a") * 3)
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return finish(counted)


def v_prehash(spark):
    # pack the group key into one bigint to shrink the agg hash key
    postings = postings_df(spark)
    a = postings.select(
        "p_brand", "trgm", F.col("p_partkey").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = postings.select(
        "p_brand", "trgm", F.col("p_partkey").alias("id_b"), F.col("sz").alias("sz_b")
    )
    joined = (
        a.join(b, ["p_brand", "trgm"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            (F.col("id_a").cast("bigint") * 4294967296 + F.col("id_b")).alias("pk"),
            "sz_a",
            "sz_b",
        )
    )
    counted = (
        joined.groupBy("pk", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            (F.col("pk") / 4294967296).cast("bigint").alias("id_a"),
            (F.col("pk") % 4294967296).alias("id_b"),
            "sz_a",
            "sz_b",
            "n_common",
        )
    )
    return finish(counted)


def v_intdict(spark):
    # dictionary-encode (brand, trigram) into one int join key via a
    # broadcast dict; pack the pair group key into one bigint.
    postings = postings_df(spark)
    dict_df = (
        postings.select("p_brand", "trgm")
        .distinct()
        .select(
            "p_brand",
            "trgm",
            F.xxhash64("p_brand", "trgm").alias("pkey"),
        )
    )
    enc = postings.join(F.broadcast(dict_df), ["p_brand", "trgm"]).select(
        "pkey", "p_partkey", "sz"
    )
    a = enc.select("pkey", F.col("p_partkey").alias("id_a"), F.col("sz").alias("sz_a"))
    b = enc.select("pkey", F.col("p_partkey").alias("id_b"), F.col("sz").alias("sz_b"))
    joined = (
        a.join(b, "pkey")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            (F.col("id_a").cast("bigint") * 4294967296 + F.col("id_b")).alias("pk"),
            "sz_a",
            "sz_b",
        )
    )
    counted = (
        joined.groupBy("pk", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            (F.col("pk") / 4294967296).cast("bigint").alias("id_a"),
            (F.col("pk") % 4294967296).alias("id_b"),
            "sz_a",
            "sz_b",
            "n_common",
        )
    )
    return finish(counted)


def v_xxkey(spark):
    # no dict build: join directly on xxhash64(brand, trgm) — the hash
    # IS the posting key (64-bit, collision-free in practice is NOT
    # acceptable for exactness... kept only to measure hash-join cost).
    postings = postings_df(spark).select(
        F.xxhash64("p_brand", "trgm").alias("pkey"), "p_partkey", "sz"
    )
    a = postings.select("pkey", F.col("p_partkey").alias("id_a"), F.col("sz").alias("sz_a"))
    b = postings.select("pkey", F.col("p_partkey").alias("id_b"), F.col("sz").alias("sz_b"))
    joined = (
        a.join(b, "pkey")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            (F.col("id_a").cast("bigint") * 4294967296 + F.col("id_b")).alias("pk"),
            "sz_a",
            "sz_b",
        )
    )
    counted = (
        joined.groupBy("pk", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            (F.col("pk") / 4294967296).cast("bigint").alias("id_a"),
            (F.col("pk") % 4294967296).alias("id_b"),
            "sz_a",
            "sz_b",
            "n_common",
        )
    )
    return finish(counted)


def main():
    spark = get_session("ab_trgm")
    spark.sparkContext.setLogLevel("ERROR")
    mat(spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count())
    mat(load_table(spark, SF, "part"))
    variants = {
        "current": v_current,
        "sizefilter": v_sizefilter,
        "prehash": v_prehash,
    }
    # interleave 3 rounds for warm fairness
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn(spark))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(k, [round(t, 2) for t in ts], "min", round(min(ts), 2))


if __name__ == "__main__":
    main()
