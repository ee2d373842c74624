"""Constraint checks ported from the reference's type system
(SURVEY.md §2.8: E23).

The reference enforces exactly two limits: ``Text`` values are at most
1,024 **bytes** (checked on both encode and decode,
``/root/reference/src/types.rs:16,33``) and rows are at most 64
columns (``types.rs:129``).  Spark types are unbounded, so the engine
re-expresses the limits as (a) a schema-width assertion at plan time
and (b) a vectorized byte-length audit at run time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query

MAX_TEXT_BYTES = 1024  # types.rs:16
MAX_COLUMNS = 64  # types.rs:129


def assert_row_width(df: DataFrame) -> DataFrame:
    """Plan-time port of the 64-column cap (``types.rs:129``)."""
    if len(df.columns) > MAX_COLUMNS:
        raise ValueError(f"row width {len(df.columns)} exceeds reference cap {MAX_COLUMNS} (types.rs:129)")
    return df


def text_violations(df: DataFrame, col: str, limit: int = MAX_TEXT_BYTES) -> DataFrame:
    """Rows whose ``col`` exceeds the byte cap (``types.rs:16``)."""
    return df.where(F.octet_length(F.col(col)) > limit)


@query(
    "constrain_text_1024_cols_64",
    oracle=f"""
        SELECT 'text_le_1024_bytes' AS constraint_name,
               COUNT(*) AS rows_checked,
               COUNT(*) FILTER (WHERE strlen(text) > {MAX_TEXT_BYTES}) AS violations,
               CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
        FROM documents
    """,
    tags=("E23",),
)
def constrain_text_1024_cols_64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23 — audit the documents table against the reference's Text cap;
    the 64-column cap is asserted at plan time (raises, like the
    reference's constructor does)."""
    d = assert_row_width(load_table(spark, sf_dir, "documents"))
    return d.agg(
        F.count("*").alias("rows_checked"),
        F.sum((F.octet_length("text") > MAX_TEXT_BYTES).cast("long")).alias("violations"),
        F.max(F.octet_length("text")).cast("long").alias("max_bytes"),
    ).select(
        F.lit("text_le_1024_bytes").alias("constraint_name"),
        "rows_checked",
        "violations",
        "max_bytes",
    )
