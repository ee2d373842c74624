#!/usr/bin/env python
"""Warm A/B: spearman via per-row rank windows vs tie-group rank maps."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.session import get_session

SF = "/root/testdata/sf0.1"
D38 = "decimal(38,0)"


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def finish(sums):
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    rho = (n * sxy - sx * sy) / F.sqrt(n * sxx - sx * sx) / F.sqrt(n * syy - sy * sy)
    return sums.select("l_returnflag", "n", F.round(rho, 9).alias("spearman_rho")).orderBy(
        "l_returnflag"
    )


def v_current(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wqt = Window.partitionBy("l_returnflag", "l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wpt = Window.partitionBy("l_returnflag", "l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        (2 * F.rank().over(wq) + F.count(F.lit(1)).over(wqt).cast("bigint") - 1).alias("rq2"),
        (2 * F.rank().over(wp) + F.count(F.lit(1)).over(wpt).cast("bigint") - 1).alias("rp2"),
    )
    sums = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rq2").cast(D38)).cast(D38).alias("sx"),
        F.sum(F.col("rp2").cast(D38)).cast(D38).alias("sy"),
        F.sum(F.col("rq2").cast(D38) * F.col("rp2")).cast(D38).alias("sxy"),
        F.sum(F.col("rq2").cast(D38) * F.col("rq2")).cast(D38).alias("sxx"),
        F.sum(F.col("rp2").cast(D38) * F.col("rp2")).cast(D38).alias("syy"),
    )
    return finish(sums)


def _rank_map(li, col):
    """Tie-group half-rank-double map: one row per distinct (flag, col);
    r2 = 2*F_prev + c + 1 where F_prev = cumulative count of smaller
    values. The window runs over DISTINCT values, never the fact."""
    dv = li.groupBy("l_returnflag", col).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return dv.select(
        "l_returnflag",
        col,
        (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias(f"r2_{col}"),
    )


def v_tiegroup(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    mq = _rank_map(li, "l_quantity")
    mp = _rank_map(li, "l_extendedprice")
    ranked = (
        li.join(F.broadcast(mq), ["l_returnflag", "l_quantity"])
        .join(mp, ["l_returnflag", "l_extendedprice"])
        .select(
            "l_returnflag",
            F.col("r2_l_quantity").alias("rq2"),
            F.col("r2_l_extendedprice").alias("rp2"),
        )
    )
    sums = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rq2").cast(D38)).cast(D38).alias("sx"),
        F.sum(F.col("rp2").cast(D38)).cast(D38).alias("sy"),
        F.sum(F.col("rq2").cast(D38) * F.col("rp2")).cast(D38).alias("sxy"),
        F.sum(F.col("rq2").cast(D38) * F.col("rq2")).cast(D38).alias("sxx"),
        F.sum(F.col("rp2").cast(D38) * F.col("rp2")).cast(D38).alias("syy"),
    )
    return finish(sums)


def main():
    spark = get_session("ab_spearman")
    spark.sparkContext.setLogLevel("ERROR")
    mat(spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count())
    mat(load_table(spark, SF, "lineitem"))
    variants = {"current": v_current, "tiegroup": v_tiegroup}
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn(spark))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(k, [round(t, 2) for t in ts], "min", round(min(ts), 2))
    a = sorted(map(tuple, v_current(spark).collect()))
    b = sorted(map(tuple, v_tiegroup(spark).collect()))
    print("identical:", a == b)


if __name__ == "__main__":
    main()
