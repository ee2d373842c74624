"""Plan-shape inspection (SURVEY.md §5.2 item 4).

The reference asserts exact physical page layouts in its tests
(``/root/reference/src/page.rs:153-218``); the analytical analog is
asserting the *physical plan* has the shape that survives scale:
filters pushed into the scan, projections pruned to ReadSchema,
dimension joins broadcast, aggregates partial-before-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "has_pushed_filter",
    "reads_only_columns",
    "has_broadcast_join",
    "has_partial_aggregate",
    "shuffle_count",
]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter mentioning
    ``fragment`` (e.g. a column name)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line.split("PushedFilters")[-1]:
            return True
    return False


def reads_only_columns(df: DataFrame, allowed: set[str], table_fragment: str) -> bool:
    """True if every parquet ReadSchema for files matching
    ``table_fragment`` contains only ``allowed`` columns (column
    pruning reached the scan)."""
    plan = formatted_plan(df)
    scans = plan.split("Scan parquet")
    ok = False
    for chunk in scans[1:]:
        head = chunk.splitlines()[0] if chunk.splitlines() else ""
        block = chunk
        if table_fragment not in head and table_fragment not in block[:400]:
            continue
        for line in block.splitlines():
            if "ReadSchema" in line:
                cols = {
                    c.split(":")[0].strip()
                    for c in line.split("struct<")[-1].rstrip(">").split(",")
                    if c.strip()
                }
                if not cols <= allowed:
                    return False
                ok = True
    return ok


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial (map-side) aggregation present before the exchange."""
    plan = formatted_plan(df)
    return "partial_" in plan or "HashAggregate" in plan


def shuffle_count(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")
