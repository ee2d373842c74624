"""Scalar-function surface (SURVEY.md §2.8: E24-E28).

The reference's only "functions" are the codec pair
``to_tuple``/``from_tuple`` (``/root/reference/src/types.rs:135-156``)
and seeded xxHash64 (``hashtable.rs:52-80``).  The engine declares the
standard analytical scalar surface; everything here is a built-in JVM
expression inside whole-stage codegen — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query


@query(
    "scalar_string",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               LOWER(c_mktsegment) AS seg_lower,
               SUBSTRING(c_name, 1, 9) AS name_prefix,
               LENGTH(c_name) AS name_len,
               CONCAT_WS('/', c_mktsegment, c_name) AS seg_name,
               REPLACE(c_name, '#', '-') AS name_dashed,
               TRIM(c_name) AS name_trim
        FROM customer
    """,
    tags=("E24",),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24 — string scalar functions over customer names."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.trim("c_name").alias("name_trim"),
    )


@query(
    "scalar_date",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
               CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
                   AS days_to_2002
        FROM orders
    """,
    tags=("E25",),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25 — temporal scalar functions over o_orderdate (stored as
    timestamp[ms]; cast to DATE consistently on both sides —
    SURVEY.md §7 risk item)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE values round-trip differently through pandas in the two
        # engines (datetime.date vs Timestamp); format as ISO strings
        # for the comparable output while still exercising the cast
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date_str"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


@query(
    "scalar_math_decimal",
    oracle="""
        SELECT p_partkey,
               ROUND(p_retailprice, 1) AS price_round1,
               ABS(p_retailprice - 1000.0) AS dist_from_1000,
               CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
               p_size % 7 AS size_mod7
        FROM part
    """,
    tags=("E26",),
)
def scalar_math_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26 — math + decimal casts (TPC-H money arithmetic).  Note the
    engine-portability casts: Spark CEIL/FLOOR return BIGINT natively,
    DuckDB returns DOUBLE — the oracle casts to match.  The DECIMAL
    round-trip is surfaced as DOUBLE on both sides: pandas renders a
    Spark DecimalType as object(Decimal) but a DuckDB DECIMAL as
    float64, which the driver's dtype-sensitive hash would treat as a
    mismatch even for equal values (ADVICE.md r1 pattern)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_round1"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_from_1000"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        (F.col("p_size") % 7).alias("size_mod7"),
    )


@query(
    "scalar_array_map_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
               UNNEST([user_id, event_id * 2]) AS arr_elem
        FROM events
    """,
    tags=("E27",),
)
def scalar_array_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E27 — JSON extraction + array construction + explode (Spark's
    UDTF-equivalent) over the events.props JSON column."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.explode(F.array(F.col("user_id"), F.col("event_id") * 2)).alias("arr_elem"),
    )


@query(
    "scalar_hash_xxhash64",
    oracle="""
        SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
               TRUE AS hash_injective,
               TRUE AS buckets_balanced
        FROM orders
    """,
    tags=("E28",),
)
def scalar_hash_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E28 — xxHash64 over the point-get key, the direct analog of the
    reference's seeded xxHash64 bucket placement
    (``/root/reference/src/hashtable.rs:52-80``).  Spark's seed is
    fixed at 42 while the reference seeds per-table
    (``hashtable.rs:95-97``); hash VALUES are engine-internal, so what
    goes through the oracle gate is the hash's CONTRACT — exactly what
    the reference's hashtable relies on: injectivity over the keyspace
    (no bucket chain ever merges two keys at fixture scale) and bucket
    balance (max load over 511 buckets within 5x the mean — measured
    3.41x at sf0.001, 1.57x at sf0.01, shrinking with n as Poisson
    predicts).  Both flags compute INSIDE the query from the full hash
    column; the oracle emits the exact key count plus literal TRUE, so
    the value hash matches iff the contract held (the
    agg_approx_percentile_bounds pattern)."""
    o = load_table(spark, sf_dir, "orders")
    hashed = o.select(
        "o_orderkey",
        F.xxhash64("o_orderkey").alias("h_key"),
        F.pmod(F.xxhash64("o_orderkey"), F.lit(511)).alias("bucket_511"),
    )
    loads = hashed.groupBy("bucket_511").agg(F.count(F.lit(1)).alias("load"))
    per_bucket = loads.agg(
        F.max("load").alias("max_load"), F.sum("load").alias("n_rows")
    )
    stats = hashed.agg(
        F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
        F.countDistinct("h_key").alias("n_hashes"),
    )
    return stats.crossJoin(per_bucket).select(
        "n_keys",
        (F.col("n_hashes") == F.col("n_keys")).alias("hash_injective"),
        (F.col("max_load") <= 5.0 * F.col("n_rows") / 511).alias("buckets_balanced"),
    )


@query(
    "scalar_hash_portable",
    oracle="""
        SELECT o_orderkey,
               md5(CAST(o_orderkey AS VARCHAR)) AS h_md5,
               sha256(CAST(o_orderkey AS VARCHAR)) AS h_sha256
        FROM orders WHERE o_orderkey < 1000
    """,
    tags=("E28",),
)
def scalar_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E28 — portable cryptographic hashes (identical hex across
    engines, unlike xxhash64): the cross-checkable half of the hash
    surface."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    key_str = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.md5(key_str).alias("h_md5"),
        F.sha2(key_str, 256).alias("h_sha256"),
    )


@query(
    "scalar_bitwise",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 4095 AS key_and,
               o_orderkey | 15 AS key_or,
               xor(o_orderkey, 255) AS key_xor,
               o_orderkey << 2 AS key_shl,
               o_orderkey >> 3 AS key_shr,
               bit_count(o_orderkey) AS key_popcount
        FROM orders WHERE o_orderkey < 2000
    """,
    tags=("E24", "R14"),
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation scalar family (AND/OR/XOR/shifts/popcount) —
    the expression surface behind the reference's planned 2-bit-per-slot
    occupancy bitmap (``/root/reference/src/hashtable.rs:157-161``):
    slot-state math like ``state >> (2*slot) & 3`` is exactly these
    operators.  All whole-stage-codegen JVM intrinsics."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(4095)).alias("key_and"),
        k.bitwiseOR(F.lit(15)).alias("key_or"),
        k.bitwiseXOR(F.lit(255)).alias("key_xor"),
        F.shiftleft(k, 2).alias("key_shl"),
        F.shiftright(k, 3).alias("key_shr"),
        F.bit_count(k).cast("bigint").alias("key_popcount"),
    )


@query(
    "agg_bitmap_occupancy",
    oracle="""
        SELECT o_custkey,
               bit_or(1 << (EXTRACT(year FROM o_orderdate) - 1995)) AS years_bitmap,
               bit_count(bit_or(1 << (EXTRACT(year FROM o_orderdate) - 1995)))
                   AS n_active_years
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("E14", "R14"),
)
def agg_bitmap_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy bitmap as an aggregation primitive: one bit per order
    year, OR-merged per customer; popcount = distinct active years.
    This is the reference's occupancy-bitmap design
    (``/root/reference/src/hashtable.rs:157-161``) promoted from a page
    slot tracker to a distributed aggregate — bit_or is associative and
    commutative, so the bitmap merges map-side like any partial agg and
    rolls up losslessly across any partitioning (the same property the
    HLL sketches exploit at higher cardinality, E67)."""
    o = load_table(spark, sf_dir, "orders")
    # shiftleft's bit-count argument is Column-valued only via SQL expr
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), year(o_orderdate) - 1995)")
    return (
        o.groupBy("o_custkey")
        .agg(F.bit_or(bit).alias("years_bitmap"))
        .select(
            "o_custkey",
            "years_bitmap",
            F.bit_count("years_bitmap").cast("bigint").alias("n_active_years"),
        )
    )


@query(
    "scalar_variant_json",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               COUNT(*) AS n,
               CAST(MIN(event_id) AS BIGINT) AS first_event
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY k
    """,
    tags=("E27",),
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` ingests the props JSON once into Variant's binary
    encoding, ``variant_get`` extracts a typed path, and the result
    aggregates like any other column.

    Variant is the engine's answer for schema-on-read columns the
    reference's tagged AnyType (types.rs:63-66) gestures at: values
    carry their own types, but — unlike string JSON probed with
    get_json_object (scalar_array_map_json) — the binary encoding
    parses ONCE per row, fields extract in O(log fields), and
    shredding can push extraction into the scan.  The oracle reads the
    same path with DuckDB's JSON functions; typed extraction semantics
    (int-typed path, null when absent) agree."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int").alias("k")
    return (
        e.select(k, "event_id")
        .where(F.col("k").isNotNull())
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").cast("bigint").alias("first_event"),
        )
    )


@query(
    "scalar_collation_groupby",
    oracle="""
        SELECT lower(p_brand) AS brand_ci,
               COUNT(*) AS n,
               CAST(MIN(p_partkey) AS BIGINT) AS first_part
        FROM part GROUP BY brand_ci
    """,
    tags=("E24",),
)
def scalar_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4 COLLATIONS: the brand
    column is compared/grouped under UTF8_LCASE collation instead of
    being physically lowercased for the comparison.

    Collation moves case/accent semantics into the TYPE, so every
    comparison (group keys, joins, DISTINCT, ORDER) inherits it without
    sprinkling lower() at each call site — and Spark can use collation
    keys inside hash aggregation directly.  The output group label is
    normalized with lower() only for display/oracle parity (DuckDB has
    no column collations; its oracle groups by lower())."""
    p = load_table(spark, sf_dir, "part")
    ci = F.collate(F.col("p_brand"), "UTF8_LCASE")
    return (
        p.groupBy(ci.alias("brand_key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_partkey").cast("bigint").alias("first_part"),
        )
        .select(
            F.lower(F.col("brand_key").cast("string")).alias("brand_ci"),
            "n",
            "first_part",
        )
    )


@query(
    "scalar_array_hof",
    oracle="""
        SELECT vec_id,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               list_position(embedding, list_max(embedding)) AS argmax_1based,
               CAST(list_count(list_distinct(list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10) AS INTEGER)))) AS INTEGER)
                 AS n_decile_bins,
               CASE WHEN list_has_any(embedding, [CAST(0.0 AS FLOAT)]) THEN 1 ELSE 0 END AS has_zero
        FROM embeddings
    """,
    tags=("E27", "E36"),
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column —
    filter / position / transform / exists composed per row with NO
    explode: positive-component count, 1-based argmax position,
    distinct coarse-bin count, zero-presence flag.

    HOFs are the engine's row-local array algebra: each expression runs
    inside whole-stage codegen over the array buffer, where the
    explode-then-reaggregate alternative would multiply the row count
    by 64 and shuffle it back.  All outputs are integers (fixed-point
    floor for the binning), so cross-engine parity is exact — the HOF
    surface itself is what's under test."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.array_position(emb, F.array_max(emb)).cast("int").alias("argmax_1based"),
        F.size(
            F.array_distinct(
                F.transform(emb, lambda x: F.floor(x.cast("double") * 10).cast("int"))
            )
        ).alias("n_decile_bins"),
        F.when(F.array_contains(emb, F.lit(0.0).cast("float")), 1).otherwise(0).alias("has_zero"),
    )


@query(
    "scalar_string_codecs",
    oracle="""
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN decode(from_base64(base64(encode(c_name)))) = c_name
                             THEN 1 ELSE 0 END) AS BIGINT) AS b64_roundtrip_ok,
               CAST(SUM(length(base64(encode(c_name)))) AS BIGINT) AS b64_total_len,
               CAST(SUM(CASE WHEN decode(from_hex(hex(encode(c_name)))) = c_name
                             THEN 1 ELSE 0 END) AS BIGINT) AS hex_roundtrip_ok,
               CAST(SUM(length(hex(encode(c_name)))) AS BIGINT) AS hex_total_len
        FROM customer
    """,
    tags=("E24", "E38"),
)
def scalar_string_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: base64 and hex encode/decode round trips
    over string payloads — the plumbing every multimodal/binary-column
    pipeline leans on (payloads cross JSON APIs base64'd; hashes and
    keys travel hex'd).  Verified as aggregate evidence: every row
    round-trips bit-exactly and the encoded lengths match DuckDB's
    (same padding rules, same hex width) — so the engine's codecs are
    interoperable, not merely self-inverse.  Row-local codegen
    expressions; the one-row result is the only thing shuffled."""
    c = load_table(spark, sf_dir, "customer")
    bin_name = F.col("c_name").cast("binary")
    enc = c.select(
        "c_name",
        F.base64(bin_name).alias("b64"),
        F.hex(bin_name).alias("hx"),
    )
    return enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.unbase64("b64").cast("string") == F.col("c_name")).cast("int"))
        .cast("bigint")
        .alias("b64_roundtrip_ok"),
        F.sum(F.length("b64")).cast("bigint").alias("b64_total_len"),
        F.sum((F.unhex("hx").cast("string") == F.col("c_name")).cast("int"))
        .cast("bigint")
        .alias("hex_roundtrip_ok"),
        F.sum(F.length("hx")).cast("bigint").alias("hex_total_len"),
    )


@query(
    "scalar_calendar_edges",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               CAST(isoyear(o_orderdate) AS INT) AS iso_year,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
               CAST(CASE WHEN (EXTRACT(YEAR FROM o_orderdate) % 4 = 0
                               AND EXTRACT(YEAR FROM o_orderdate) % 100 <> 0)
                          OR EXTRACT(YEAR FROM o_orderdate) % 400 = 0
                    THEN 1 ELSE 0 END AS INT) AS is_leap_year
        FROM orders
        WHERE o_orderkey % 7 = 0
        ORDER BY o_orderkey
    """,
    tags=("E25",),
)
def scalar_calendar_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar edge semantics — the classic cross-engine divergence
    zone, pinned value-for-value: month addition that clamps at
    month-end (Jan 31 + 1 month), last_day, ISO week/year (week 1 =
    the week with the year's first Thursday; Dec 29+ can be ISO week 1
    of NEXT year — iso_year is output alongside to prove both engines
    agree on the boundary), quarters, and the Gregorian leap-year
    rule spelled as arithmetic.  An engine migration that silently
    shifts week numbering corrupts every weekly rollup downstream;
    this op is the regression net."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_month"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.expr("extract(yearofweek FROM o_orderdate)").cast("int").alias("iso_year"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.quarter(d).cast("int").alias("qtr"),
        F.when(
            ((F.year(d) % 4 == 0) & (F.year(d) % 100 != 0)) | (F.year(d) % 400 == 0),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("is_leap_year"),
    ).orderBy("o_orderkey")


@query(
    "scalar_surrogate_key_uuid5",
    oracle="""
        SELECT o_orderkey,
               substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-' ||
               substring(h, 13, 4) || '-' || substring(h, 17, 4) || '-' ||
               substring(h, 21, 12) AS surrogate_uuid
        FROM (
            SELECT o_orderkey,
                   md5('potpot:orders:' || CAST(o_orderkey AS VARCHAR)) AS h
            FROM orders WHERE o_orderkey < 2000
        )
    """,
    tags=("E24", "E28"),
)
def scalar_surrogate_key_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UUID-shaped surrogate keys (the UUIDv5 idea:
    namespace + business key -> md5 -> UUID format) — the stable join
    key a warehouse mints when integrating systems whose natural keys
    collide; unlike ``uuid()`` (random, engine-seeded) the same row
    gets the same surrogate on every engine, every run, every backfill
    — which is the entire point, and what makes it oracle-checkable
    character-for-character.  Pure string expressions, codegen'd."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    h = F.md5(F.concat(F.lit("potpot:orders:"), F.col("o_orderkey").cast("string")))
    uuid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return o.select("o_orderkey", uuid.alias("surrogate_uuid"))


@query(
    "scalar_luhn_check_digit",
    oracle="""
        WITH ids AS (
            SELECT o_orderkey,
                   lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS body
            FROM orders
        ),
        digits AS (
            SELECT o_orderkey, body,
                   CAST(SUM(
                       CASE WHEN (13 - g.k) % 2 = 1 THEN
                           CASE WHEN CAST(body[g.k] AS BIGINT) * 2 > 9
                                THEN CAST(body[g.k] AS BIGINT) * 2 - 9
                                ELSE CAST(body[g.k] AS BIGINT) * 2 END
                       ELSE CAST(body[g.k] AS BIGINT) END) AS BIGINT) AS s
            FROM ids,
                 LATERAL (SELECT unnest(generate_series(1, 12)) AS k) g
            GROUP BY o_orderkey, body
        )
        SELECT o_orderkey, body,
               CAST((10 - s % 10) % 10 AS BIGINT) AS luhn_digit,
               body || CAST((10 - s % 10) % 10 AS VARCHAR) AS account_number
        FROM digits
        ORDER BY o_orderkey
    """,
    tags=("E434",),
)
def scalar_luhn_check_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN CHECK DIGIT generation (ISO/IEC 7812 — card numbers, IMEIs,
    surrogate account ids): zero-pad the key to a 12-digit body,
    double every second digit from the right (casting out nines), and
    append the mod-10 check digit — the data-quality primitive that
    lets every downstream system REJECT single-digit typos and most
    transpositions without a lookup.  Generation here; validation is
    the same sum tested against 0.

    Exact: pure integer digit manipulation — substring picks, parity
    on position-from-the-right, one modulus — identical everywhere.
    Plan: stateless map over a JVM transform of 12 fixed positions —
    no shuffle, whole-stage codegen, the cheapest possible scalar."""
    o = load_table(spark, sf_dir, "orders")
    body = F.lpad(F.col("o_orderkey").cast("string"), 12, "0")
    withbody = o.select("o_orderkey", body.alias("body"))
    digit = lambda k: F.substring("body", k, 1).cast("bigint")  # noqa: E731
    terms = []
    for k in range(1, 13):
        d = digit(k)
        if (13 - k) % 2 == 1:
            terms.append(
                F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
            )
        else:
            terms.append(d)
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    check = (10 - s % 10) % 10
    return withbody.select(
        "o_orderkey",
        "body",
        check.cast("bigint").alias("luhn_digit"),
        F.concat(F.col("body"), check.cast("string")).alias("account_number"),
    ).orderBy("o_orderkey")
