"""SQL-surface completions: conditional expressions, filtered
aggregates, regexp functions, null-ordering semantics, and
edit-distance fuzzy matching.

Individually small, collectively what makes an engine *complete
enough to switch to* — each is a `queries()` entry so the driver's
oracle gate pins its exact ANSI semantics (null propagation, regexp
dialect overlap, NULLS FIRST/LAST order) against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum_expr
from potpot_spark.registry import query


@query(
    "scalar_conditional",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
               greatest(o_totalprice, 150000.0) AS floor_price,
               least(CAST(o_orderkey AS DOUBLE), 1000.0) AS capped_key
        FROM orders WHERE o_orderkey < 2000
    """,
    tags=("E7", "E24"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression family: CASE ladders, NULLIF/COALESCE
    null-channeling, GREATEST/LEAST — all codegen'd JVM expressions."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("floor_price"),
        F.least(F.col("o_orderkey").cast("double"), F.lit(1000.0)).alias("capped_key"),
    )


@query(
    "agg_filtered_conditional",
    oracle=f"""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS discounted_lines,
               COUNT(*) FILTER (WHERE l_quantity >= 40) AS bulk_lines,
               {dsum_expr('l_extendedprice', scale=2)} AS total_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("E14",),
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates: several differently-predicated
    aggregates in ONE pass over the fact table (the alternative — one
    scan per predicate — multiplies 100 TB scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return l.groupBy("l_returnflag").agg(
        F.count(F.when(disc, 1)).alias("discounted_lines"),
        F.count(F.when(F.col("l_quantity") >= 40, 1)).alias("bulk_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        F.sum(F.when(disc, F.col("l_extendedprice").cast("decimal(18,2)")))
        .cast("double")
        .alias("discounted_price"),
    )


@query(
    "scalar_regexp",
    oracle="""
        SELECT doc_id,
               regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
               len(regexp_extract_all(text, '[0-9]+')) AS number_count,
               contains(regexp_replace(text, '[aeiou]', '_', 'g'), '_') AS has_vowel,
               regexp_matches(text, '^[A-Z]') AS starts_upper
        FROM documents WHERE doc_id < 200
    """,
    tags=("E24",),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface on the dialect intersection of Spark (Java regex)
    and DuckDB (RE2): extraction, global count, global replace,
    anchored match."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.expr(r"regexp_extract_all(text, '[0-9]+', 0)")).alias("number_count"),
        F.regexp_replace("text", "[aeiou]", "_").contains("_").alias("has_vowel"),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
    )


@query(
    "sort_nulls_ordering",
    oracle="""
        SELECT event_id,
               nullif(event_type, 'error') AS maybe_type,
               value
        FROM events
        WHERE event_id < 500
        ORDER BY nullif(event_type, 'error') NULLS FIRST, value DESC, event_id
        LIMIT 100
    """,
    tags=("E21",),
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering (engines default differently:
    Spark NULLS FIRST asc, DuckDB NULLS LAST — portable queries must
    say what they mean).  Result order itself isn't hashed by the
    driver (order-insensitive compare), but the LIMIT makes the kept
    SET order-dependent, which is what pins the semantics."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    maybe = F.nullif(F.col("event_type"), F.lit("error"))
    return (
        e.select("event_id", maybe.alias("maybe_type"), "value")
        .orderBy(
            F.col("maybe_type").asc_nulls_first(),
            F.col("value").desc(),
            F.col("event_id").asc(),
        )
        .limit(100)
    )


@query(
    "text_edit_distance_block",
    oracle="""
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) AS prefix_edit_dist
        FROM documents a
        JOIN documents b
          ON a.lang = b.lang
         AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 5
        WHERE levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) <= 20
    """,
    tags=("E35", "E24"),
)
def text_edit_distance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching on blocked candidate pairs (same
    lang, similar length) over an 80-char prefix.  Levenshtein is
    O(len^2) per pair — the prefix cap and the blocking keys are what
    keep it tractable; full-text edit distance at corpus scale is
    always wrong.

    Two scale fixes, A/B'd r3 warm at sf0.1 (5.1 s → ~0.6 s):
    (a) the length constraint is a JOIN KEY, not a post-join filter —
    rows band into width-8 n_chars buckets and the left side fans to
    its 3 adjacent buckets (the join_range_banded recipe), so the
    candidate stream shrinks 16x before the join condition runs; each
    qualifying pair meets exactly once (the right side's single bucket
    value occurs once in the left fan), no dedup pass, oracle
    unchanged.  (b) the probe side REPARTITIONS before the broadcast
    join: the fixture is one parquet row group = one task, which
    serialized every levenshtein onto a single core — the 1000-split
    layout a real corpus scan gets for free, restored explicitly."""
    band = 8  # > max |Δchars| (5): qualifying pairs are never >1 bucket apart
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.substring("text", 1, 80).alias("prefix")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.col("n_chars").alias("chars_a"),
        F.col("prefix").alias("pa"),
        F.explode(
            F.array(
                *[(F.col("n_chars") / band).cast("bigint") + i for i in (-1, 0, 1)]
            )
        ).alias("bucket"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        F.col("n_chars").alias("chars_b"),
        F.col("prefix").alias("pb"),
        (F.col("n_chars") / band).cast("bigint").alias("bucket"),
    )
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    return (
        a.repartition(n_parts)
        .join(F.broadcast(b), ["lang", "bucket"])
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("chars_a") - F.col("chars_b")) <= 5)
        )
        .where(dist <= 20)
        # bigint: levenshtein() is int32, the oracle's is int64 — the
        # driver's value hash is dtype-sensitive (round-1 lesson)
        .select("doc_a", "doc_b", dist.cast("bigint").alias("prefix_edit_dist"))
    )


# One dialect-neutral SQL string, executed VERBATIM by both Spark SQL
# and DuckDB — the strongest possible parity statement: not two
# translations of one intent, but one text with two engines under it.
_SQL_TOPK_PER_NATION = """
    WITH rev AS (
        SELECT c.c_nationkey,
               o.o_custkey AS custkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT c_nationkey, custkey, revenue,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY revenue DESC, custkey) AS rnk
        FROM rev
    )
    SELECT c_nationkey, custkey, revenue, rnk
    FROM ranked WHERE rnk <= 3
"""


@query("sql_api_composite", oracle=_SQL_TOPK_PER_NATION, tags=("E14", "E18"))
def sql_api_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: top-3 customers by revenue per nation,
    expressed as ONE SQL string (CTE → join → aggregate → window →
    rank filter) run through ``spark.sql`` over registered views —
    and the oracle is the IDENTICAL string run by DuckDB.

    Everything else in this engine uses the DataFrame API; this op
    pins down that the SQL surface is equally first-class (same
    Catalyst plan as the DataFrame formulation — rank-filter becomes
    WindowGroupLimit, the dim join broadcasts, decimal money path) and
    that the engine speaks the ANSI dialect intersection unmodified.
    A user migrating SQL workloads runs their text as-is."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_TOPK_PER_NATION)


# Second verbatim-shared SQL text: a correlated LATERAL subquery —
# the "for each outer row, run this parameterized query" form that
# window functions can't always replace (arbitrary inner LIMIT/agg).
_SQL_LATERAL_TOPK = """
    SELECT r.r_name, l.n_name, l.bal
    FROM region r, LATERAL (
        SELECT n.n_name,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY bal DESC, n.n_name
        LIMIT 2
    ) l
"""


@query("sql_api_lateral_topk", oracle=_SQL_LATERAL_TOPK, tags=("E14", "E18"))
def sql_api_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery through the SQL front door: per
    region, the top-2 nations by total customer balance — ONE SQL text
    run verbatim by Spark SQL and DuckDB (same contract as
    sql_api_composite).

    LATERAL is the second SQL-surface capability worth pinning: Spark
    decorrelates the subquery (DecorrelateInnerQuery) into a
    rank-filtered join rather than executing it per outer row — so
    the text that LOOKS like a nested loop plans like the window
    formulation (win_rank_topk_per_group), which is exactly what a
    SQL-workload migration needs to be true at 100 TB.  Decimal money
    path and full (bal, name) tie-break keep it value-exact."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_TOPK)


# Third verbatim-shared SQL text: a RECURSIVE CTE (Spark 4.0+ finally
# supports WITH RECURSIVE, making iterative SQL portable).  The
# customer keyspace forms an implicit binary tree (k -> 2k, 2k+1) —
# the recursion walks it from the root and reports the level census,
# exercising a data-driven (not precomputed) recursion depth.
_SQL_RECURSIVE_TREE = """
WITH RECURSIVE chain(c_custkey, depth) AS (
    SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey = 1
    UNION ALL
    SELECT c.c_custkey, chain.depth + 1
    FROM customer c JOIN chain
      ON c.c_custkey = chain.c_custkey * 2 OR c.c_custkey = chain.c_custkey * 2 + 1
)
SELECT depth, COUNT(*) AS n_customers, MIN(c_custkey) AS min_key,
       MAX(c_custkey) AS max_key
FROM chain GROUP BY depth ORDER BY depth
"""


@query("sql_api_recursive_cte", oracle=_SQL_RECURSIVE_TREE, tags=("E14", "E18"))
def sql_api_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL front door: walk the implicit
    binary tree over customer keys (k -> 2k, 2k+1) from the root and
    count nodes per depth — ONE SQL text run verbatim by Spark SQL
    (4.0+ UnionLoop execution) and DuckDB.

    This is the third shared-text SQL op (with sql_api_composite and
    sql_api_lateral_topk) and pins the capability the reference's
    engine family most conspicuously lacks: ITERATION inside the
    declarative surface.  The recursion depth is data-driven
    (log2 of the customer count — deeper at every SF), each step is
    a joined filter against the base table (not a constant unroll),
    and Spark bounds runaway recursion with
    spark.sql.cteRecursionLevelLimit (default 100).  The same
    pattern gives transitive closure / org-chart / BOM queries at
    scale, where each level is one distributed join.  (Measured: an
    eager narrow-shuffle rewrite of the loop is NOT faster here — AQE
    already right-sizes the per-level joins.)"""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_RECURSIVE_TREE)


@query(
    "scan_observe_metrics",
    oracle=f"""
        SELECT COUNT(*) AS n_shipped,
               {dsum_expr('l_extendedprice * (1 - l_discount)', scale=4)} AS revenue,
               CAST(SUM(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
        FROM lineitem
        WHERE l_returnflag = 'N'
    """,
    tags=("E26", "E1"),
)
def scan_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piggybacked data-quality metrics via the Observation API:
    counters and sums accumulate DURING the main query's single pass
    (AggregatingAccumulator on the executors) — no second scan, no
    separate monitoring job.  This is how a 100 TB pipeline gets its
    row counts, revenue totals, and anomaly tallies for free on every
    run; the oracle recomputes the same metrics the expensive way
    (a dedicated aggregate) and must agree exactly, decimal-summed
    for order independence."""
    from pyspark.sql import Observation

    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "N")
    obs = Observation("shipping_metrics")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    observed = l.observe(
        obs,
        F.count(F.lit(1)).alias("n_shipped"),
        F.sum(rev).cast("double").alias("revenue"),
        F.sum(F.when(F.col("l_quantity") >= 45, 1).otherwise(0)).alias("n_bulk"),
    )
    # one real action drives the pipeline; the metrics ride along
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_shipped"], m["revenue"], m["n_bulk"])],
        "n_shipped bigint, revenue double, n_bulk bigint",
    )


# Fourth verbatim-shared SQL text: the window-function suite — named
# WINDOW clause, ranking, LAG navigation, and an explicit running
# frame in one statement.  Everything stays in the ANSI dialect
# intersection (year()*100+month() as the portable month key; decimal
# casts for money so both engines sum exactly).
_SQL_WINDOW_SUITE = """
WITH monthly AS (
    SELECT o_custkey,
           year(o_orderdate) * 100 + month(o_orderdate) AS month_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders
    WHERE o_custkey % 7 = 0
    GROUP BY o_custkey, year(o_orderdate) * 100 + month(o_orderdate)
)
SELECT o_custkey, month_id, spend,
       ROW_NUMBER() OVER w AS rn,
       CAST(ROUND(CAST(spend - LAG(spend, 1) OVER w AS DECIMAL(18,2)), 2)
            AS DOUBLE) AS delta_prev,
       CAST(SUM(CAST(spend AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY month_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM monthly
WINDOW w AS (PARTITION BY o_custkey ORDER BY month_id)
"""


@query("sql_api_window_suite", oracle=_SQL_WINDOW_SUITE, tags=("E18", "E19", "E20"))
def sql_api_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions through the SQL front door: per-customer
    monthly spend with rank, previous-month delta (LAG), and an
    explicit running-total frame — ONE SQL text, including a named
    WINDOW clause, run verbatim by Spark SQL and DuckDB.

    Pins that the three window families (ranking, value navigation,
    aggregate frames) share one partitioning in the SQL surface
    exactly as they do in the DataFrame API (windows_ext.py): Catalyst
    plans a single sort-based Window over (o_custkey, month_id) for
    all three expressions — one shuffle, one sort, every function
    rides it."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_WINDOW_SUITE)


# Fifth verbatim-shared SQL text: GROUPING SETS with explicit
# super-aggregate labeling — the report-matrix form (detail, per-status
# subtotal, grand total) in one pass.
_SQL_GROUPING_SETS = """
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@query("sql_api_grouping_sets", oracle=_SQL_GROUPING_SETS, tags=("E17",))
def sql_api_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL front door — ONE text shared
    verbatim with DuckDB (the DataFrame-side twin is
    agg_grouping_sets_cube_rollup / agg_grouping_id_flags).  Spark
    compiles the three sets into a single Expand + one hash
    aggregate: the data is read once however many grouping sets the
    report asks for — the property that matters when the fact table
    is 100 TB and the report wants five pivots of it."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_GROUPING_SETS)


@query(
    "sql_pipe_syntax",
    oracle="""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS segment_total
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    tags=("E24", "E14"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (`|>`): the linear
    scan → filter → join → aggregate → sort dataflow written top-to-
    bottom instead of inside-out — the SQL front door's modern form
    (same Catalyst plan as the classic text; the oracle is the
    equivalent classic formulation since DuckDB has no pipe
    operator).  Each `|>` stage is sugar over the same logical
    operators, so pushdown/broadcast/partial-agg behavior is
    unchanged."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |> JOIN customer ON c_custkey = o_custkey
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS segment_total
           GROUP BY c_mktsegment
        |> ORDER BY c_mktsegment
        """
    )


# Sixth verbatim-shared SQL text: bag-semantics set operators.
_SQL_SET_OPS = """
WITH big AS (
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
),
urgent AS (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (
    SELECT o_custkey FROM big INTERSECT ALL SELECT o_custkey FROM urgent
)
UNION ALL
SELECT 'except_all', COUNT(*) FROM (
    SELECT o_custkey FROM big EXCEPT ALL SELECT o_custkey FROM urgent
)
UNION ALL
SELECT 'union_distinct', COUNT(*) FROM (
    SELECT o_custkey FROM big UNION SELECT o_custkey FROM urgent
)
ORDER BY op
"""


@query("sql_api_set_ops", oracle=_SQL_SET_OPS, tags=("E22",))
def sql_api_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operators through the SQL front door —
    INTERSECT ALL / EXCEPT ALL / UNION in ONE text run verbatim on
    both engines (the DataFrame twins are set_union_intersect_except).
    ALL variants matter because multiplicity carries meaning in fact
    data (a customer with three big orders minus one urgent one keeps
    two rows); Spark plans them as joins on row-identity counts, not
    dedup-then-join."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_SET_OPS)


@query(
    "audit_referential_integrity",
    oracle="""
        WITH pk AS (
            SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_pk_dupes
            FROM orders
        ),
        fk AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_fk_orphans
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        ),
        nn AS (
            SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_null_custkey
            FROM orders
        )
        SELECT pk.n_pk_dupes, fk.n_fk_orphans, nn.n_null_custkey,
               pk.n_pk_dupes = 0 AS pk_unique_ok,
               fk.n_fk_orphans = 0 AS fk_complete_ok,
               nn.n_null_custkey = 0 AS not_null_ok
        FROM pk, fk, nn
    """,
    tags=("E23", "E11"),
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the dbt-style constraint test
    suite as one query: primary-key uniqueness on orders, foreign-key
    completeness lineitem→orders (anti-join orphan count), and a
    not-null check — the three checks every warehouse runs after
    ingest, since Spark (like the reference's unfinished constraint
    machinery, ``/root/reference/src/types.rs``) enforces none of them
    at write time.  Counts AND boolean verdicts ship together so the
    gate is self-describing.  Scale: the orphan check is a left-anti
    join shuffling only the key column; the PK check is one
    count-distinct pass."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pk = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("n_pk_dupes")
    )
    fk = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fk_orphans"))
    )
    nn = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_custkey")
    )
    return (
        pk.crossJoin(fk)
        .crossJoin(nn)
        .select(
            "n_pk_dupes",
            "n_fk_orphans",
            "n_null_custkey",
            (F.col("n_pk_dupes") == 0).alias("pk_unique_ok"),
            (F.col("n_fk_orphans") == 0).alias("fk_complete_ok"),
            (F.col("n_null_custkey") == 0).alias("not_null_ok"),
        )
    )


@query(
    "sql_api_group_by_all",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)
                   AS ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY 1, 2, 3
    """,
    tags=("E124", "E14"),
)
def sql_api_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ordinal ORDER BY — the modern SQL ergonomics
    both engines ship (Spark 3.4+/DuckDB): every non-aggregate select
    item becomes a grouping key automatically, so adding a dimension
    to the report cannot silently desynchronize the GROUP BY list —
    the classic copy-paste bug this syntax exists to kill.  Run
    through the engine's SQL front door (spark.sql over a registered
    view), not the DataFrame API, because the surface under test IS
    the SQL dialect."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY 1, 2, 3
        """
    )


@query(
    "sql_api_values_inline_dim",
    oracle="""
        SELECT d.category,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e
        JOIN (VALUES ('view', 'browse'), ('click', 'browse'),
                     ('purchase', 'transact'), ('signup', 'acquire'),
                     ('error', 'defect')) AS d(event_type, category)
          ON e.event_type = d.event_type
        GROUP BY d.category
        ORDER BY d.category
    """,
    tags=("E124", "E9"),
)
def sql_api_values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INLINE VALUES dimension: the five event types roll up to three
    business categories via a lookup table declared IN the query —
    the idiom for tiny, code-reviewed mappings that don't deserve a
    parquet file (and the purest possible broadcast join: the dim is
    literal rows in the plan).  Exercised through the SQL front door
    on both engines, grouped counts exact."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.category,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e
        JOIN VALUES ('view', 'browse'), ('click', 'browse'),
                    ('purchase', 'transact'), ('signup', 'acquire'),
                    ('error', 'defect') AS d(event_type, category)
          ON e.event_type = d.event_type
        GROUP BY d.category
        ORDER BY d.category
        """
    )


@query(
    "sql_api_lateral_view_explode",
    oracle="""
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents WHERE lang = 'en'
        )
        WHERE w <> ''
        GROUP BY w
        ORDER BY n DESC, w
        LIMIT 20
    """,
    tags=("E124", "E47"),
)
def sql_api_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIVEQL LATERAL VIEW surface: the legacy `LATERAL VIEW
    explode(...)` syntax that a decade of migrated Hive warehouses
    still speak — same plan as modern `explode()` in the select list,
    but the dialect must parse for drop-in compatibility (the engine's
    SQL front door is only a front door if old SQL walks through it).

    Top-20 English words with (count, word) deterministic ordering;
    counts exact; TakeOrdered, no global sort."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents
        LATERAL VIEW explode(split(lower(text), ' ')) t AS w
        WHERE lang = 'en' AND w != ''
        GROUP BY w
        ORDER BY n DESC, w
        LIMIT 20
        """
    )


# Verbatim-shared SQL text: correlated EXISTS / NOT EXISTS / scalar
# subquery — the three decorrelation shapes Catalyst must rewrite into
# joins (semi, anti, left) without changing semantics.
_SQL_CORRELATED = """
    SELECT c.c_custkey,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT MAX(o.o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 150000)
      AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F'
                AND o.o_totalprice < 30000)
    ORDER BY c.c_custkey
"""


@query("sql_api_exists_correlated", oracle=_SQL_CORRELATED, tags=("E379",))
def sql_api_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries through the SQL front door, one verbatim
    text both engines run: EXISTS (→ left-semi join), NOT EXISTS
    (→ left-anti join), and two correlated scalar aggregates in the
    select list (→ left-join + aggregate after decorrelation).  These
    are the shapes every migrated warehouse workload leans on; the op
    pins that Catalyst's decorrelation rewrites preserve semantics
    bit-for-bit against DuckDB's.

    Plan note: all four subqueries hit the same orders table — after
    decorrelation Spark runs them as joins on o_custkey, sharing the
    shuffle; none executes per-row.  Deterministic: keys, counts,
    MAX — no floats but o_totalprice passthrough (exact parquet
    doubles on both sides)."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_CORRELATED)


@query(
    "sql_api_star_except_order_all",
    oracle="""
        SELECT * EXCLUDE (o_orderstatus, o_orderpriority)
        FROM (
            SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(MIN(o_orderkey) AS BIGINT) AS min_key
            FROM orders
            GROUP BY ALL
        )
        ORDER BY ALL
    """,
    tags=("E409",),
)
def sql_api_star_except_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(...) + ORDER BY ALL — the column-pruning and
    total-ordering ergonomics of modern SQL, exercised through the SQL
    front door: the star-except drops the grouping keys from a rollup
    (the "all measures, no dimensions" projection every BI export
    wants) and ORDER BY ALL pins a total deterministic order without
    enumerating columns.  Spark 4 spells the exclusion EXCEPT, DuckDB
    spells it EXCLUDE — same semantics, the one dialect seam this op
    documents (the oracle carries the DuckDB spelling).

    Plan note: EXCEPT is resolved at ANALYSIS time, so column pruning
    still reaches the scan — the pruned columns never leave parquet;
    ORDER BY ALL is an ordinary global sort on the 2 surviving
    columns."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * EXCEPT (o_orderstatus, o_orderpriority)
        FROM (
            SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(MIN(o_orderkey) AS BIGINT) AS min_key
            FROM orders
            GROUP BY ALL
        )
        ORDER BY ALL
        """
    )


@query(
    "sql_pivot_unpivot_syntax",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events
            WHERE event_type IN ('click', 'view', 'purchase')
            GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days_present,
               CAST(SUM(c) AS BIGINT) AS total_events,
               CAST(MAX(c) AS BIGINT) AS peak_day_events
        FROM daily
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("E553",),
)
def sql_pivot_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-native PIVOT ... FOR ... IN and UNPIVOT ... FOR ... IN
    clauses, round-tripped: daily event counts pivot WIDE (one column
    per event type), then UNPIVOT back to long and aggregate — the
    reshape surface at the SQL FRONT DOOR (the DataFrame reshape ops
    are registered separately; BI tools and migrating warehouse SQL
    speak these clauses).  The round trip is the honest test: UNPIVOT
    drops NULL cells by default, so days where a type never fired
    vanish again — n_days_present pins that NULL semantics exactly.

    The oracle is the equivalent classic conditional aggregation
    (engine-neutral text).  Catalyst rewrites PIVOT to the same
    group-aggregate-with-CASE plan, so pushdown and partial
    aggregation are unchanged — the clause is front-door sugar, not
    a new operator, and costs nothing at 100 TB beyond the day-grain
    rollup it wraps."""
    from potpot_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events
            WHERE event_type IN ('click', 'view', 'purchase')
            GROUP BY 1, 2
        ),
        wide AS (
            SELECT * FROM daily
            PIVOT (SUM(c) FOR event_type
                   IN ('click' AS click, 'view' AS view,
                       'purchase' AS purchase))
        ),
        long AS (
            SELECT day, event_type, c FROM wide
            UNPIVOT (c FOR event_type IN (click, view, purchase))
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days_present,
               CAST(SUM(c) AS BIGINT) AS total_events,
               CAST(MAX(c) AS BIGINT) AS peak_day_events
        FROM long
        GROUP BY event_type
        ORDER BY event_type
        """
    )
