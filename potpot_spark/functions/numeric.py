"""Order-independent numeric aggregation helpers.

Spark sums double columns in partition/AQE-dependent order while DuckDB
sums sequentially, so raw ``SUM(double)`` differs between engines (and
between Spark runs!) by amounts that grow with row count — at sf0.1 the
drift already exceeds cent-level rounding.  The fix, applied on BOTH
sides of every oracle pair, is exact decimal accumulation:

    Spark : F.sum(col.cast("decimal(18,2)")).cast("double")
    DuckDB: CAST(SUM(CAST(col AS DECIMAL(18,2))) AS DOUBLE)

Decimal addition is exact and associative, so the result is independent
of partitioning, and the final decimal -> double conversion is exact
whenever the scaled value fits in 2^53 (true for all test aggregates).
This also matters at 100 TB: it makes results reproducible across
cluster sizes and AQE decisions, not just oracle-matching.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dec",
    "dsum",
    "davg",
    "dsum_expr",
    "davg_expr",
    "phash60",
    "phash60_expr",
]


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast a double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM over a double column (exact decimal path)."""
    return F.sum(dec(col, scale, precision)).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum divided by count.

    Both engines then perform the identical double division, which is
    deterministic given identical operands.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale, precision)).cast("double") / F.count(c)


def dsum_expr(sql_expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side twin of :func:`dsum` as a SQL fragment."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_expr(sql_expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side twin of :func:`davg` as a SQL fragment."""
    return (
        f"CAST(SUM(CAST({sql_expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({sql_expr})"
    )


def phash60(c: Column) -> Column:
    """Engine-portable 60-bit hash of a string column: the first 15 hex
    digits of md5, as a non-negative long.

    The md5 text walk is the portability price vs ``xxhash64`` (whose
    seeds are Spark-internal); every sketch/signature built on this
    hash is bit-reproducible in any engine, which is what lets
    'approximate' structures (MinHash, SimHash, KMV, Count-Min) go
    through the exact DuckDB oracle gate instead of rows-only checks.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash60_expr(sql_expr: str) -> str:
    """DuckDB-side twin of :func:`phash60` as a SQL fragment."""
    return f"CAST(('0x' || substring(md5({sql_expr}), 1, 15)) AS BIGINT)"
