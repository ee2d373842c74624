"""Scan operators (SURVEY.md §2.2: E1, E3).

The reference's entire read stack is ``PagedFile::read_page`` ->
``BufferPool::read_page`` -> ``SlottedPage::get_record``
(``/root/reference/src/storage.rs:57-65``, ``bufferpool.rs:103-126``,
``page.rs:74-78``).  On Spark the equivalent is a parquet scan, which
additionally gives column pruning, predicate pushdown, and page-level
checksums (the reference CRC-checks pages at ``aligned.rs:61-64``;
Parquet does the same in-format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from potpot_spark.catalog import load_table, table_path
from potpot_spark.registry import query

# Explicit engine-side schema for E3: fail fast on drift instead of
# silently inferring (the reference fails fast on page-type/CRC
# mismatch at aligned.rs:93-107; this is the analytical analog).
LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)


@query(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("E1",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — full scan of a table (the analytical ``read_page`` path)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "scan_with_schema_check",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_orderkey < 100
    """,
    tags=("E3",),
)
def scan_with_schema_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — scan with a declared schema; mismatches surface as nulls/errors
    instead of silent inference drift.  Projection is pruned to three
    columns — at 100 TB the scan must read only those column chunks
    (asserted via ReadSchema in tests/test_plans.py)."""
    df = spark.read.schema(LINEITEM_SCHEMA).parquet(table_path(sf_dir, "lineitem"))
    return df.where(F.col("l_orderkey") < 100).select("l_orderkey", "l_linenumber", "l_quantity")


@query("scan_file_metadata", oracle=None, tags=("E1", "rows-only"))
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file lineage audit via the hidden ``_metadata`` struct every
    file source exposes: rows and bytes per physical input file.  This
    is the operational primitive behind data-lineage and small-file
    diagnostics (the input side of maintenance_compact_small_files) —
    at 100 TB "which file did this row come from" is how bad-file
    quarantine and backfill verification work without re-reading the
    lake.  Rows-only check: file names/sizes are physical layout, not
    SQL-expressible over the oracle's logical views (modification time
    is deliberately excluded as unstable)."""
    df = spark.read.parquet(table_path(sf_dir, "lineitem"))
    return (
        df.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_name", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
