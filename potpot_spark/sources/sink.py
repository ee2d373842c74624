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

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum_expr
from potpot_spark.registry import query
from potpot_spark.scratch import scratch_dir, scratch_path


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
    target = os.path.join(scratch_dir("potpot_sink_"), "orders_slice")
    append_parquet(out, target)
    return spark.read.parquet(target)


@query(
    "sink_merge_upsert",
    oracle="""
        WITH changes AS (
            SELECT o_orderkey,
                   o_custkey,
                   CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                              * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE)
                     AS o_totalprice,
                   'P' AS o_orderstatus
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders),
                   o_custkey, o_totalprice, 'N'
            FROM orders WHERE o_orderkey % 293 = 0
        )
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
               COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
               COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               CASE WHEN c.o_orderkey IS NULL THEN 'kept'
                    WHEN b.o_orderkey IS NULL THEN 'inserted'
                    ELSE 'updated' END AS merge_action
        FROM orders b
        FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
    """,
    tags=("E2", "R1"),
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE / upsert-by-key: apply a change set (updates +
    inserts) to a base table — the analytical completion of the
    reference's ``query::insert`` (``/root/reference/src/query.rs:3-5``),
    which only ever appends.  Expressed as a FULL OUTER join on the key
    with per-column COALESCE (changes win), plus an audit column saying
    what happened to each row.  The change set is derived
    deterministically from the base (every 97th key updated, every
    293rd re-keyed past max as an insert) so the op is self-contained
    and oracle-exact.  At 100 TB the same plan holds: the change set is
    tiny relative to base, AQE broadcasts it, and the base table scan
    is the only large input; with a partitioned base the join collapses
    to the touched partitions (see sink_insert_overwrite_dynamic for
    the partition-slice variant)."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    max_key = base.agg(F.max("o_orderkey").alias("mx"))
    updates = base.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        "o_custkey",
        # decimal path: double*1.1 then ROUND hits half-way ties that the
        # engines break differently (observed once at sf0.1); exact
        # decimal multiply makes the tie value itself exact, and decimal
        # HALF_UP rounding agrees everywhere
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(3,2)"),
            2,
        )
        .cast("double")
        .alias("o_totalprice"),
        F.lit("P").alias("o_orderstatus"),
    )
    inserts = (
        base.where(F.col("o_orderkey") % 293 == 0)
        .join(F.broadcast(max_key))
        .select(
            (F.col("o_orderkey") + F.col("mx")).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            F.lit("N").alias("o_orderstatus"),
        )
    )
    changes = updates.unionByName(inserts)
    b, c = base.alias("b"), changes.alias("c")
    return b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer").select(
        F.coalesce("c.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
        F.coalesce("c.o_custkey", "b.o_custkey").alias("o_custkey"),
        F.coalesce("c.o_totalprice", "b.o_totalprice").alias("o_totalprice"),
        F.coalesce("c.o_orderstatus", "b.o_orderstatus").alias("o_orderstatus"),
        F.when(F.col("c.o_orderkey").isNull(), "kept")
        .when(F.col("b.o_orderkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


@query(
    "stream_sink_files_exactly_once",
    oracle="""
        SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids
        FROM events GROUP BY event_type
    """,
    tags=("E2", "E4"),
)
def stream_sink_files_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parquet file sink with exactly-once file semantics:
    stream the events source into a parquet directory (availableNow),
    then prove the landed files hold exactly the input — per-type row
    counts AND distinct event ids match the batch table.

    The guarantee comes from the sink's commit log (_spark_metadata):
    a file only becomes visible when its micro-batch commits, and a
    retried batch re-commits the SAME file list — readers see each
    record once even across failures.  This is the append half of the
    reference's write path (query::insert, query.rs:3-5) done
    durably-idempotent at scale; the foreachBatch MERGE op
    (stream_foreach_batch_upsert) is the upsert half."""
    from potpot_spark.streaming.runner import stream_events

    out = os.path.join(scratch_dir("potpot_stream_sink_"), "events_out")
    ckpt = scratch_dir("potpot_stream_sink_ckpt_")
    q = (
        stream_events(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("n_ids"),
    )


@query(
    "sink_export_manifest",
    oracle="""
        SELECT o_orderstatus AS partition_value,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS partition_total
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("E2", "E26"),
)
def sink_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-with-manifest: write orders hive-partitioned, then build
    the manifest FROM THE WRITTEN FILES (per-partition row counts and
    checksums-by-sum via the ``_metadata`` hidden column) — the
    handoff contract every downstream consumer wants ("which files,
    how many rows, does it reconcile") and the first thing a data
    platform audits after a 100 TB export.

    The manifest must reconcile exactly with aggregating the source —
    which is what the oracle asserts.  Reading back with _metadata
    costs one scan of the written files; file-level grouping falls out
    of the partition directory structure."""
    import os

    src = load_table(spark, sf_dir, "orders")
    target = os.path.join(scratch_dir("potpot_export_"), "orders_export")
    src.select("o_orderkey", "o_totalprice", "o_orderstatus").write.mode(
        "overwrite"
    ).partitionBy("o_orderstatus").parquet(target)
    back = spark.read.parquet(target)
    return (
        back.groupBy(F.col("o_orderstatus").alias("partition_value"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "partition_total"
            ),
        )
        .orderBy("partition_value")
    )


@query(
    "sink_versioned_snapshots",
    oracle="""
        WITH v2_updates AS (
            SELECT o_orderkey FROM orders WHERE o_orderkey % 101 = 0
        )
        SELECT 1 AS version,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
        FROM orders
        UNION ALL
        SELECT 2,
               COUNT(*),
               CAST(SUM(CASE WHEN (o.o_orderkey IN (SELECT o_orderkey FROM v2_updates)
                              AND o.o_orderstatus <> 'F')
                          OR (o.o_orderkey NOT IN (SELECT o_orderkey FROM v2_updates)
                              AND o.o_orderstatus = 'F')
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders o
        ORDER BY version
    """,
    tags=("E2", "R1"),
)
def sink_versioned_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning without a table format: each write lands in
    ``v=N/`` and readers pin a version directory — the minimal
    time-travel discipline (what Delta/Iceberg formalize with
    manifests) built from plain parquet + immutable version dirs.
    Version 2 applies a deterministic change (every 101st key flips
    F-status); BOTH versions then remain queryable side by side, and
    the op reports each snapshot's row count and F-count — proving v1
    is untouched by v2's write (immutability is the whole point).

    At 100 TB: versions share nothing here (full copies); the real
    cost model is why table formats do manifest-level sharing — the
    reader contract (pin a snapshot, never see partial writes) is
    identical."""
    import os

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    root = scratch_dir("potpot_versions_")
    base.write.mode("overwrite").parquet(os.path.join(root, "v=1"))
    flipped = base.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 101 == 0,
            F.when(F.col("o_orderstatus") != "F", "F").otherwise("O"),
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    flipped.write.mode("overwrite").parquet(os.path.join(root, "v=2"))
    out = []
    for v in (1, 2):
        snap = spark.read.parquet(os.path.join(root, f"v={v}"))
        out.append(
            snap.agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                    "n_f"
                ),
            )
        )
    return out[0].unionByName(out[1]).orderBy("version")


PARQUET_CODECS = ("snappy", "zstd", "gzip")


@query(
    "sink_parquet_codecs_roundtrip",
    oracle=f"""
        SELECT codec,
               COUNT(*) AS n_rows,
               {dsum_expr('l_extendedprice * (1 - l_discount)', scale=4)} AS revenue
        FROM (
            SELECT unnest({list(PARQUET_CODECS)}) AS codec
        ) c, lineitem
        WHERE l_returnflag = 'A'
        GROUP BY codec
        ORDER BY codec
    """,
    tags=("E2", "E1"),
)
def sink_parquet_codecs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec round trip: the same lineitem slice written
    with snappy / zstd / gzip parquet codecs, read back, and proven
    content-identical per codec (row count + exact-decimal revenue all
    equal the source aggregate).  Codec choice is a storage-layer
    knob — zstd for cold data (~2x smaller than snappy at similar scan
    cost on modern CPUs), snappy for hot paths — and MUST be
    semantically invisible; this query is the invisibility proof the
    engine ships.  At 100 TB codec migration is a partition-by-
    partition rewrite with exactly this equality check as the
    validation gate."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "A")
    # Deterministic per-sf_dir path, overwritten each run: the returned
    # DataFrame reads these files lazily, so they cannot be rmtree'd here;
    # reuse bounds the on-disk footprint at one copy per codec, and the
    # per-run scratch root removes everything at interpreter exit.
    base = scratch_path(
        "potpot_codecs_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    )
    outs = []
    for codec in PARQUET_CODECS:
        path = os.path.join(base, codec)
        li.write.mode("overwrite").option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        outs.append(
            back.groupBy(F.lit(codec).alias("codec")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                .cast("double")
                .alias("revenue"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("codec")
