"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``potpot_spark``; this module only adapts the
registry to the driver's three-function contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from potpot_spark import registry  # noqa: E402
from potpot_spark.operators.aggregates import pricing_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary, SURVEY.md §7
    milestone 0) on /root/testdata/sf0.001; driver checks rows>0."""
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return pricing_summary(lineitem)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query (keys without
    an entry here get the driver's weaker rows-only check)."""
    return registry.all_oracles()
