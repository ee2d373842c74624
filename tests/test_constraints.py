"""Constraint-port tests (SURVEY.md §5.2 item 3): the engine enforces
the reference's two real limits — Text <= 1,024 bytes
(``types.rs:16,33``) and <= 64 columns (``types.rs:129``)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potpot_spark.functions.constraints import (
    MAX_COLUMNS,
    MAX_TEXT_BYTES,
    assert_row_width,
    text_violations,
)


def test_wide_row_rejected(spark):
    df = spark.range(1)
    for i in range(MAX_COLUMNS):
        df = df.withColumn(f"c{i}", F.lit(i))
    with pytest.raises(ValueError, match="row width"):
        assert_row_width(df)


def test_max_width_row_accepted(spark):
    df = spark.range(1).select(*[F.lit(i).alias(f"c{i}") for i in range(MAX_COLUMNS)])
    assert assert_row_width(df) is df


def test_text_violations_detects_oversized(spark):
    ok = "x" * MAX_TEXT_BYTES
    bad = "y" * (MAX_TEXT_BYTES + 1)
    multibyte_bad = "é" * ((MAX_TEXT_BYTES // 2) + 1)  # 2 bytes each in UTF-8
    df = spark.createDataFrame([(1, ok), (2, bad), (3, multibyte_bad)], ["id", "t"])
    viol = {r.id for r in text_violations(df, "t").collect()}
    assert viol == {2, 3}


def test_constraint_audit_counts(spark, sf_dir):
    from potpot_spark.functions.constraints import constrain_text_1024_cols_64

    row = constrain_text_1024_cols_64(spark, sf_dir).first()
    assert row.rows_checked > 0
    assert row.violations == 0  # fixture corpus is within the cap
