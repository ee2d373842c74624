#!/usr/bin/env python
"""Prefix-filter on/off A/B for text_trigram_name_similarity at sf0.1.

Backs the lossless-filter claim in operators/text.py (_trgm_ranked):
the FULL pair set (no top-k limit) from the prefix-filtered split
verify must be byte-identical to a brute posting-join verify that
indexes every trigram.  Prints row counts, a symmetric-difference
count (must be 0), and warm timings for both variants.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.operators.text import (
    TRGM_MIN_SIM_U,
    _trgm_encode,
    _trgm_names,
    _trgm_similar_pairs,
)
from potpot_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def brute_pairs(names, min_sim_u):
    """No prefix filter: every trigram indexed, overlap counted in one
    posting self-join (the pre-r5 plan, minus array_intersect)."""
    enc = _trgm_encode(names)
    a = enc.select("pkey", F.col("p_partkey").alias("id_a"), F.col("sz").alias("sz_a"))
    b = enc.select("pkey", F.col("p_partkey").alias("id_b"), F.col("sz").alias("sz_b"))
    counted = (
        a.join(b, "pkey")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sim_u = F.floor(
        F.col("n_common").cast("double") * 1000000 / F.col("n_union")
    ).cast("bigint")
    return (
        counted.select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
            .cast("bigint")
            .alias("n_union"),
        )
        .select("id_a", "id_b", "n_common", sim_u.alias("sim_u"))
        .where(F.col("sim_u") >= int(min_sim_u))
    )


def main():
    spark = get_session("ab_trgm_prefix")
    spark.sparkContext.setLogLevel("ERROR")
    names = _trgm_names(load_table(spark, SF, "part"))
    mat(names)  # warm the scan

    filt = _trgm_similar_pairs(names, TRGM_MIN_SIM_U)
    brut = brute_pairs(names, TRGM_MIN_SIM_U)

    t0 = time.perf_counter()
    mat(filt)
    t_f = time.perf_counter() - t0
    t0 = time.perf_counter()
    mat(brut)
    t_b = time.perf_counter() - t0

    n_f = filt.count()
    n_b = brut.count()
    sym = (
        filt.exceptAll(brut).unionAll(brut.exceptAll(filt)).count()
    )
    print(
        f"sf={SF} filtered_rows={n_f} brute_rows={n_b} symdiff={sym} "
        f"t_filtered={t_f:.2f}s t_brute={t_b:.2f}s"
    )
    assert sym == 0 and n_f == n_b, "prefix filter is NOT lossless here"


if __name__ == "__main__":
    main()
