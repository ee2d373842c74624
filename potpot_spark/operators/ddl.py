"""SQL DDL / catalog surface: managed tables, ANALYZE statistics,
parameterized queries, and ANSI-safe try_* arithmetic.

The reference's "catalog" is one implicit table in one paged file
(``/root/reference/src/storage.rs:12-25`` — no DDL, no names, no
multi-table support).  The engine's catalog is Spark's: CREATE /
INSERT INTO / DROP round-trip through the session catalog (Derby-less
in-memory metastore + spark-warehouse directory), table and column
statistics feed the cost-based optimizer, and the SQL front door
takes named parameters without string splicing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table, register_views
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query


@query(
    "sql_ddl_managed_table",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {dsum_expr('o_totalprice')} AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("E1", "E18"),
)
def sql_ddl_managed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-table DDL round trip: CREATE TABLE ... USING PARQUET,
    INSERT INTO ... SELECT from the source view, aggregate from the
    managed table, DROP it — the full catalog lifecycle a SQL user
    expects (the reference has a single anonymous pagefile; the engine
    has named tables whose storage Spark owns end-to-end).

    The INSERT runs as a distributed parquet write into the warehouse
    directory; the readback is a plain catalog scan with pushdown —
    verifying that data surviving a catalog round trip is identical to
    querying the source directly (the oracle never sees the managed
    table)."""
    register_views(spark, sf_dir)
    tbl = f"potpot_orders_{uuid.uuid4().hex[:8]}"
    spark.sql(
        f"""CREATE TABLE {tbl} (
            o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP
        ) USING PARQUET"""
    )
    try:
        spark.sql(
            f"""INSERT INTO {tbl}
                SELECT o_orderstatus, o_totalprice, o_orderdate
                FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'"""
        )
        out = spark.sql(
            f"""SELECT o_orderstatus, COUNT(*) AS n_orders,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS total_price
                FROM {tbl} GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        ).localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return out


@query(
    "sql_analyze_table_stats",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(MIN(p_size) AS BIGINT) AS min_size,
               CAST(MAX(p_size) AS BIGINT) AS max_size,
               COUNT(p_retailprice) AS n_price_non_null
        FROM part
    """,
    tags=("E18", "E26"),
)
def sql_analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS: collect
    catalog statistics on a managed copy of ``part``, then answer the
    profiling question FROM THE CATALOG (DESCRIBE EXTENDED metadata)
    without rescanning data — the stats that feed Spark's cost-based
    optimizer (join reordering, broadcast decisions) and every
    metadata-only rowcount shortcut.

    The oracle recomputes the same numbers from the raw table, pinning
    that catalog stats are exact (row count, min/max, null counts are
    exact in Spark's ANALYZE; only distinct counts are HLL estimates,
    so those stay out of the contract)."""
    tbl = f"potpot_part_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "part").write.saveAsTable(tbl)
    try:
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS p_size, p_retailprice")
        n_rows = int(
            spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
            .where(F.col("col_name") == "Statistics")
            .select("data_type")
            .first()[0]
            .split(",")[1]
            .strip()
            .split(" ")[0]
        )
        size_stats = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl} p_size").collect()
        }
        price_stats = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl} p_retailprice").collect()
        }
        out = spark.createDataFrame(
            [
                (
                    n_rows,
                    int(size_stats["min"]),
                    int(size_stats["max"]),
                    n_rows - int(price_stats["num_nulls"]),
                )
            ],
            "n_rows bigint, min_size bigint, max_size bigint, n_price_non_null bigint",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return out


@query(
    "scalar_try_family",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN (o_orderkey % 10) <> 0
                    THEN o_totalprice / (o_orderkey % 10) END AS safe_div,
               TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
               TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price_roundtrip
        FROM orders
        ORDER BY o_orderkey
        LIMIT 500
    """,
    tags=("E24",),
)
def scalar_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs with ANSI mode ON by default,
    so 1/0 and bad casts THROW — and try_divide / try_cast are the
    sanctioned per-expression escape hatch that returns NULL instead
    (the right granularity: one lenient expression, not a lenient
    session).  Non-numeric strings cast to NULL, numeric round-trips
    survive exactly, and division by the zero residue class nulls out
    — each pinned against DuckDB's TRY_CAST / CASE-guard semantics."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice"),
                F.when((F.col("o_orderkey") % 10) != 0, F.col("o_orderkey") % 10),
            ).alias("safe_div"),
            F.try_to_number("o_orderstatus", F.lit("999")).cast("int").alias(
                "status_as_int"
            ),
            F.col("o_totalprice").cast("string").cast("double").alias("price_roundtrip"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "sql_parameterized_query",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("E18",),
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 3.4+): the text uses :status and
    :min_price placeholders and values bind server-side — no string
    splicing, no injection surface, plan cache friendly (the same
    parameterized text replans cheaply for new literals).  The oracle
    runs the fully-bound equivalent."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"status": "F", "min_price": 50000.0},
    )


@query(
    "sql_session_variables",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        FROM orders
        WHERE o_totalprice > 250000.0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("E24",),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables (DECLARE / SET VARIABLE): the
    threshold lives in a typed session variable referenced by name in
    the query text — how SQL-workflow users parameterize multi-step
    scripts without string interpolation (the injection-safe cousin of
    sql_parameterized_query's named binds).  The variable resolves at
    analysis time to a literal, so the plan is identical to the
    constant form — pushdown and pruning see a plain predicate."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE big_cutoff DOUBLE DEFAULT 100000.0")
    spark.sql("SET VARIABLE big_cutoff = 250000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        FROM orders
        WHERE o_totalprice > big_cutoff
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_udf_scalar_and_table",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_big,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue
        FROM lineitem
        WHERE l_quantity >= 45.0
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("E24", "E14"),
)
def sql_udf_scalar_and_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 3.5+/4 `CREATE FUNCTION ... RETURN`):
    a scalar UDF (discounted price) and a TABLE function (bulk
    lineitems above a quantity parameter) declared in pure SQL and
    composed in one query — the catalog-resident, engine-portable way
    SQL users package logic (no JVM jar, no Python worker: the body
    INLINES into the plan at analysis time, so pushdown, codegen, and
    decimal-exact aggregation all see straight expressions).  The
    oracle runs the inlined form directly — identical by
    construction, which is precisely the point of SQL UDFs."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bulk_items(minq DOUBLE)
        RETURNS TABLE(l_returnflag STRING, l_extendedprice DOUBLE, l_discount DOUBLE)
        RETURN SELECT l_returnflag, l_extendedprice, l_discount
               FROM lineitem WHERE l_quantity >= minq
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_big,
               CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue
        FROM bulk_items(45.0)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "sql_identifier_clause",
    oracle="""
        SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_keys
        FROM orders
        UNION ALL
        SELECT 'customer', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
        FROM customer
        ORDER BY tbl
    """,
    tags=("E18", "E24"),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 IDENTIFIER() clause: table and column NAMES arrive as
    bound string parameters — `FROM IDENTIFIER(:tbl)` — closing the
    one hole named-parameter binds (sql_parameterized_query) leave
    open, since identifiers cannot be bound as values.  The pattern
    behind safe multi-tenant "run this audit over table X keyed by
    column Y" templates: no string splicing, the identifier resolves
    at analysis time and the plan is identical to the static form.
    The oracle runs the fully-resolved equivalents."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    parts = []
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        parts.append(
            spark.sql(
                """
                SELECT :tbl AS tbl, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(COUNT(DISTINCT IDENTIFIER(:key)) AS BIGINT) AS n_keys
                FROM IDENTIFIER(:tbl)
                """,
                args={"tbl": tbl, "key": key},
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl")
