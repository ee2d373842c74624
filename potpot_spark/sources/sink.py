"""Sink operators (SURVEY.md §2.2: E2).

The reference's write path is ``query::insert`` ->
``RecordManager::append_record`` -> ``BufferPool::append_page`` ->
``PagedFile::append_page`` with fsync per page
(``/root/reference/src/query.rs:3-5``, ``record.rs:19-41``,
``bufferpool.rs:129-142``, ``storage.rs:77-84``).  Spark's append-mode
parquet write gives the same durable-append capability with automatic
file rollover (the reference spills to a fresh page when the current
one is full, ``record.rs:31-37``; Spark rolls part-files).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query


def append_parquet(df: DataFrame, path: str) -> None:
    """Durable append: the analytical ``query::insert``.

    At scale: the writer parallelism is the upstream partitioning; we
    deliberately do NOT coalesce(1) — one file per task is the
    scalable layout, small-file compaction is a separate maintenance
    op.
    """
    df.write.mode("append").parquet(path)


@query(
    "sink_parquet_append",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey < 500
    """,
    tags=("E2",),
)
def sink_parquet_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — write-then-read round trip (mirrors the reference's
    write-then-read page test at ``storage.rs:108-132``): append a
    slice of orders to a scratch parquet dir, read it back, return it.
    The oracle sees the same rows straight from the source table, so
    the round trip must be lossless."""
    src = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    out = src.select("o_orderkey", "o_custkey", "o_totalprice")
    target = os.path.join(tempfile.mkdtemp(prefix="potpot_sink_"), "orders_slice")
    append_parquet(out, target)
    return spark.read.parquet(target)
