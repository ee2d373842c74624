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


@query(
    "scan_file_metadata",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_total,
               TRUE AS has_files,
               TRUE AS all_files_nonempty,
               TRUE AS rows_reconcile
        FROM lineitem
    """,
    tags=("E1",),
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file lineage audit via the hidden ``_metadata`` struct every
    file source exposes: rows and bytes per physical input file.  This
    is the operational primitive behind data-lineage and small-file
    diagnostics (the input side of maintenance_compact_small_files) —
    at 100 TB "which file did this row come from" is how bad-file
    quarantine and backfill verification work without re-reading the
    lake.

    File names/sizes are physical layout with no SQL twin, so the
    hashed contract is the RECONCILIATION: metadata-attributed row
    counts summed over files must equal the table's logical COUNT(*)
    (computed independently by a second scan), every file must be
    non-empty, and at least one file must exist.  The oracle emits the
    same logical count plus literal TRUE flags — a lost or
    double-attributed file flips the hash."""
    df = spark.read.parquet(table_path(sf_dir, "lineitem"))
    per_file = (
        df.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_name", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    logical = spark.read.parquet(table_path(sf_dir, "lineitem")).agg(
        F.count(F.lit(1)).alias("n_logical")
    )
    return (
        per_file.agg(
            F.sum("n_rows").cast("bigint").alias("n_rows_total"),
            (F.count(F.lit(1)) >= 1).alias("has_files"),
            (F.min("file_size") > 0).alias("all_files_nonempty"),
        )
        .crossJoin(logical)
        .select(
            "n_rows_total",
            "has_files",
            "all_files_nonempty",
            (F.col("n_rows_total") == F.col("n_logical")).alias("rows_reconcile"),
        )
    )
