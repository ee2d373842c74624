"""Table catalog: register the driver's parquet tables as temp views.

The reference has *no* catalog — its "table" is a single paged file
(``/root/reference/src/storage.rs:12-25``).  Here the catalog is a thin
mapping from table name -> parquet path; Spark's own catalog handles
resolution from there (SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "table_path", "load_table", "load_tables", "register_views", "spread", "DEFAULT_SF_DIR"]

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw events scan.  The fixture's ``ts`` physical type has varied
    across driver rounds — TIMESTAMP(NANOS) (readable only as int64
    under ``spark.sql.legacy.parquet.nanosAsLong``, declared in
    session.py DEFAULT_CONFS) in round 1, TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read as TIMESTAMP_NTZ) since round 2.
    ``normalize_events_ts`` converts either to session-TZ
    TimestampType downstream.

    The conf is re-asserted here (idempotently, same value as
    DEFAULT_CONFS) because the driver may hand us a session it built
    itself."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, "events"))


def nanos_to_ts(col_name: str) -> "F.Column":  # noqa: F821 (typing only)
    from pyspark.sql import functions as F

    return F.timestamp_micros(F.expr(f"{col_name} div 1000"))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Surface ``ts`` as microsecond TimestampType regardless of the
    fixture's physical encoding (int64 nanos or TIMESTAMP_NTZ micros).
    Works on batch and streaming DataFrames alike (pure projection)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):  # TIMESTAMP(NANOS) via nanosAsLong
        return df.withColumn("ts", nanos_to_ts("ts"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (operator E1, ``scan_parquet``).

    This is the analytical read path replacing the reference's
    ``BufferPool::read_page`` -> ``SlottedPage::get_record`` chain
    (``/root/reference/src/bufferpool.rs:103-126``, ``page.rs:74-78``):
    columnar scan with predicate pushdown and column pruning instead of
    page-at-a-time record access.

    ``events.ts`` is nanosecond parquet; it is surfaced as microsecond
    TimestampType (truncated, matching ``CAST(ts AS TIMESTAMP)`` in
    DuckDB oracles — SURVEY.md §7 risk item).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return normalize_events_ts(load_events_raw(spark, sf_dir))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so SQL-form queries work."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's core count — the
    explicit split a small fixture needs before CPU-heavy per-row
    pipelines (shingling, signature hashing, edit distance).

    The test parquet files are a single row group, so Spark plans ONE
    scan task and every downstream narrow operator serializes onto one
    core until the first exchange; a real 100 TB corpus arrives in
    thousands of splits and never hits this.  A/B r3 warm at sf0.1:
    the banded n-gram Jaccard pipeline dropped 5.1 s -> 0.75 s from
    this one change.  Outputs are layout-invariant by the engine's
    determinism contract, so the round-robin placement cannot change
    any result."""
    sc = df.sparkSession.sparkContext
    return df.repartition(max(2, sc.defaultParallelism))
