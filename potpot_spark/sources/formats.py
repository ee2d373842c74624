"""Format connectors beyond parquet: CSV and JSON-lines round trips.

The reference's only format is its slotted page + tagged tuple
(``/root/reference/src/page.rs:17-31``, ``types.rs:135-156``); an
engine users can switch to needs the interchange formats their data
already lives in.  Both operators write a deterministic slice to a
scratch dir in the engine format, read it back with an EXPLICIT schema
(schema inference is a full extra pass over the data at 100 TB — never
rely on it in production paths), and return the round-tripped rows; the
oracle reads the same slice straight from parquet, so the round trip
must be lossless.

Scale notes: CSV/JSON are row-oriented, splittable (uncompressed / with
splittable codecs), but carry no column statistics — no predicate
pushdown, no column pruning.  The engine treats them as INGEST formats:
read once with explicit schema, write parquet, query the parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query
from potpot_spark.scratch import scratch_dir, scratch_path

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)

_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("props", T.StringType()),
    ]
)


@query(
    "scan_csv_roundtrip",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey < 300
    """,
    tags=("E1", "E2"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV connector: parquet slice -> headered CSV -> read back with an
    explicit schema (``inferSchema`` would cost a second full pass)."""
    src = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 300)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    target = os.path.join(scratch_dir("potpot_csv_"), "orders_csv")
    src.write.mode("overwrite").option("header", True).csv(target)
    return spark.read.schema(_CSV_SCHEMA).option("header", True).csv(target)


@query(
    "scan_json_roundtrip",
    oracle="""
        SELECT event_id, event_type, user_id, props
        FROM events WHERE event_id < 300
    """,
    tags=("E1", "E2", "E27"),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines connector round trip with explicit schema.  ``props``
    is a JSON string column carried opaquely — parsing it is a separate
    operator (``scalar_array_map_json``), not a scan concern."""
    src = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < 300)
        .select("event_id", "event_type", "user_id", "props")
    )
    target = os.path.join(scratch_dir("potpot_json_"), "events_json")
    src.write.mode("overwrite").json(target)
    return spark.read.schema(_JSON_SCHEMA).json(target)


@query(
    "scan_schema_evolution",
    oracle="""
        SELECT o_orderkey, o_totalprice, CAST(NULL AS DOUBLE) AS discount_pct
        FROM orders WHERE o_orderkey < 200
        UNION ALL
        SELECT o_orderkey, o_totalprice, 0.1 AS discount_pct
        FROM orders WHERE o_orderkey >= 200 AND o_orderkey < 400
    """,
    tags=("E1", "E3"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: a v1 batch (3 columns) and a v2 batch
    (adds ``discount_pct``) land in the same dataset; ``mergeSchema``
    reconciles the footers and v1 rows surface NULL for the new column
    — additive-column evolution without rewriting history.  At 100 TB,
    rewriting old files for every schema change is a non-starter;
    merge-on-read is the only viable policy (pay the footer-merge cost
    explicitly — it is OFF by default for scan-planning speed)."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    target = os.path.join(scratch_dir("potpot_evo_"), "orders_evolving")
    src.where(F.col("o_orderkey") < 200).write.mode("append").parquet(target)
    (
        src.where((F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 400))
        .withColumn("discount_pct", F.lit(0.1))
        .write.mode("append")
        .parquet(target)
    )
    return spark.read.option("mergeSchema", True).parquet(target)


@query(
    "scan_orc_roundtrip",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("E1", "E2"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector: write lineitem to ORC, read it back, aggregate.
    Equality with the oracle (which reads the original parquet) proves
    the round-trip is lossless.

    ORC is the second columnar format large estates actually hold
    (Hive-era warehouses), and Spark's reader gives it the same
    predicate-pushdown/column-pruning machinery as parquet — the
    engine's format surface is a reader config, not new operator code.
    The write uses snappy + dictionary defaults; schema (including the
    timestamp column) survives unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    target = os.path.join(scratch_dir("potpot_orc_"), "lineitem_orc")
    li.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    from potpot_spark.functions.numeric import dsum

    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", 2).alias("total_price"),
    )


_CSV_BAD_LINES = [
    "not_a_number,O,123.45",          # unparseable key
    "42,F",                           # missing column
    "43,P,price_is_text",             # unparseable double
    "44,O,9.99,extra,columns,here",   # too many columns
]


@query(
    "scan_csv_malformed_permissive",
    oracle=f"""
        SELECT COUNT(*) AS n_good,
               CAST({len(_CSV_BAD_LINES)} AS BIGINT) AS n_corrupt,
               COUNT(*) + {len(_CSV_BAD_LINES)} AS n_total
        FROM orders WHERE o_orderkey % 10 = 0
    """,
    tags=("E3", "E51"),
)
def scan_csv_malformed_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode CSV ingestion over a file with injected garbage:
    good rows parse, each malformed line (bad types, wrong arity)
    lands intact in ``_corrupt_record`` instead of failing the job —
    the quarantine pattern every large-scale ingest needs, because at
    100 TB there is ALWAYS a malformed line and FAILFAST means the
    4-hour job dies at hour 3.

    The op writes a typed orders slice to CSV, appends four
    deliberately-broken lines, reads back with an explicit schema +
    corrupt-record column, and reports good/corrupt/total counts.
    The corrupt rows stay queryable (dead-letter table) rather than
    silently dropped — DROPMALFORMED's failure mode."""
    o = load_table(spark, sf_dir, "orders")
    subset = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = scratch_dir("potpot_badcsv_")
    target = os.path.join(base, "orders_csv")
    subset.coalesce(1).write.mode("overwrite").csv(target)
    # Inject malformed lines directly into the landed part file.
    import glob

    part = glob.glob(os.path.join(target, "part-*.csv"))[0]
    with open(part, "a", encoding="utf-8") as f:
        for line in _CSV_BAD_LINES:
            f.write(line + "\n")
    # The local-FS committer wrote .crc sidecars; the append invalidated
    # them, so drop them or the re-read fails with ChecksumException.
    for crc in glob.glob(os.path.join(target, ".*.crc")):
        os.remove(crc)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(target)
        .cache()  # required: corrupt-record queries must not re-parse lazily
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "scan_json_typed_parse",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_min,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY event_type
    """,
    tags=("E27", "E52"),
)
def scan_json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-projected JSON parse: ``from_json(props, 'k INT')``
    parses each embedded JSON document ONCE into a typed struct —
    the ingest-time form of JSON access, vs per-call path extraction
    (``get_json_object``, scalar_array_map_json) and binary VARIANT
    (scalar_variant_json).  With a declared schema the parser skips
    unrequested fields entirely; malformed documents become NULL
    structs instead of errors (same PERMISSIVE contract as the CSV
    quarantine op).  At 100 TB this is the difference between parsing
    the JSON blob once per row and once per extracted field.  Integer
    aggregates — exact on any partitioning."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select("event_type", F.from_json("props", "k INT").alias("p"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("p.k")).alias("k_min"),
        F.max(F.col("p.k")).alias("k_max"),
        F.sum(F.col("p.k")).cast("bigint").alias("k_sum"),
    )


@query(
    "scan_fixed_width_parse",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {dsum_expr('o_totalprice')} AS total_price
        FROM orders
        WHERE o_orderkey < 5000
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("E3",),
)
def scan_fixed_width_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (mainframe/COBOL-style) text ingestion: serialize
    orders into 23-byte records (10-char zero-padded key, 1-char
    status, 12-char right-aligned price), write as plain text, read
    back with ``spark.read.text`` + substring slicing — the
    no-delimiter legacy format every migration eventually meets.

    Parsing is pure codegen (substr + trim + cast per field — no
    Python, no regex); at 100 TB the text scan splits on line
    boundaries like any other.  The price survives the round trip
    digit-for-digit because the formatting is format_string('%12.2f')
    and the readback casts through DECIMAL(12,2), not a double parse
    of arbitrary digits.  The oracle aggregates the source table
    directly — layout round trips must be invisible."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 5000)
    lines = o.select(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 10, "0"),
            F.col("o_orderstatus"),
            F.format_string("%12.2f", F.col("o_totalprice")),
        ).alias("value")
    )
    target = os.path.join(scratch_dir("potpot_fw_"), "orders_fw")
    lines.write.mode("overwrite").text(target)
    back = spark.read.text(target).select(
        F.substring("value", 1, 10).cast("int").alias("o_orderkey"),
        F.substring("value", 11, 1).alias("o_orderstatus"),
        F.trim(F.substring("value", 12, 12)).cast("decimal(12,2)").alias("o_totalprice"),
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "total_price"
            ),
        )
        .orderBy("o_orderstatus")
    )


FIXTURE_TABLES = (
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier",
)


@query(
    "scan_binary_files",
    oracle=f"""
        SELECT UNNEST({[t + ".parquet" for t in FIXTURE_TABLES]}) AS file_name,
               TRUE AS nonempty,
               TRUE AS sha_matches_manifest
        ORDER BY file_name
    """,
    tags=("E1", "E38"),
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the ingestion format for multimodal
    payloads (images/audio/video land as whole-file blobs + metadata
    before any decode): read the fixture parquet files themselves as
    binary blobs, sha256 each blob DISTRIBUTED (executor-side
    ``sha2``), and prove every digest equals an independently computed
    driver-side ``hashlib`` manifest of the same files.

    At 100 TB this is the first stage of every multimodal pipeline:
    binaryFile scans parallelize per file, `pathGlobFilter` prunes at
    list time, and the blob column flows into mapInPandas decoders
    (multimodal.py) without a JVM round trip.  Absolute paths and byte
    sizes are environment-bound, so the hashed contract is the
    manifest check: one row per fixture table, blob non-empty, and the
    distributed checksum equal to the local one (the oracle emits the
    fixed file list plus literal TRUE) — a truncated or corrupted blob
    read flips the hash."""
    import hashlib

    from potpot_spark.catalog import table_path

    manifest = {
        t + ".parquet": hashlib.sha256(
            open(table_path(sf_dir, t), "rb").read()
        ).hexdigest()
        for t in FIXTURE_TABLES
    }
    manifest_df = spark.createDataFrame(
        [(k, v) for k, v in sorted(manifest.items())],
        "file_name string, sha_local string",
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return (
        bf.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            (F.col("length") > 0).alias("nonempty"),
            F.sha2(F.col("content"), 256).alias("sha_dist"),
        )
        .join(F.broadcast(manifest_df), "file_name")
        .select(
            "file_name",
            "nonempty",
            (F.col("sha_dist") == F.col("sha_local")).alias("sha_matches_manifest"),
        )
        .orderBy("file_name")
    )


_JSON_BAD_LINES = [
    '{"event_id": "not_a_number", "event_type": "view"}',   # unparseable key
    '{"event_id": 900001, "event_type": ',                  # truncated JSON
    'this is not json at all',                              # garbage line
]


@query(
    "scan_json_corrupt_quarantine",
    oracle=f"""
        SELECT COUNT(*) AS n_good,
               CAST({len(_JSON_BAD_LINES)} AS BIGINT) AS n_corrupt,
               COUNT(*) + {len(_JSON_BAD_LINES)} AS n_total,
               CAST(SUM(event_id) AS BIGINT) AS good_id_sum
        FROM events WHERE event_id % 10 = 0
    """,
    tags=("E3", "E52"),
)
def scan_json_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode JSON-lines ingestion over a file with injected
    corruption — the JSON sibling of scan_csv_malformed_permissive
    (the connector-robustness pair every ingest needs): good rows
    parse against the explicit schema, truncated/garbage/mistyped
    lines land intact in ``_corrupt_record`` as a queryable
    dead-letter table, the job never dies.  The good-row id checksum
    goes through the oracle so quarantining provably did not eat or
    duplicate a single good record."""
    e = load_table(spark, sf_dir, "events")
    subset = e.where(F.col("event_id") % 10 == 0).select(
        "event_id", "event_type", "user_id"
    )
    base = scratch_dir("potpot_badjson_")
    target = os.path.join(base, "events_json")
    subset.coalesce(1).write.mode("overwrite").json(target)
    import glob

    part = glob.glob(os.path.join(target, "part-*.json"))[0]
    with open(part, "a", encoding="utf-8") as f:
        for line in _JSON_BAD_LINES:
            f.write(line + "\n")
    for crc in glob.glob(os.path.join(target, ".*.crc")):
        os.remove(crc)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(target)
        .cache()  # corrupt-record queries must not re-parse lazily
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count("_corrupt_record").cast("bigint").alias("n_corrupt"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("event_id")))
        .cast("bigint")
        .alias("good_id_sum"),
    )


@query(
    "scan_csv_multiline_quoted",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
               CAST(SUM(CASE WHEN c_comment LIKE '%
%' THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline
        FROM (
            SELECT c_custkey,
                   c_name || chr(10) || c_mktsegment AS c_comment
            FROM customer WHERE c_custkey % 7 = 0
        )
    """,
    tags=("E51", "E3"),
)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV with EMBEDDED NEWLINES inside quoted fields — the classic
    ingestion trap: without ``multiLine`` each record's second
    physical line parses as a broken row, and at 100 TB someone's
    free-text comment column always contains a newline.  The op
    writes a customer slice with a synthesized newline-bearing
    comment column, round-trips it through quoted CSV with
    ``multiLine=true``, and proves (row count + key checksum +
    count of still-multiline values through the oracle, which
    recomputes from the source table) that every embedded newline
    survived parsing intact.  Note the trade the option buys into:
    multiLine CSV files are not splittable mid-record, so production
    lands them small or converts to parquet at the edge."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    subset = c.select(
        "c_custkey",
        F.concat_ws("\n", F.col("c_name"), F.col("c_mktsegment")).alias("c_comment"),
    )
    base = scratch_dir("potpot_mlcsv_")
    target = os.path.join(base, "customer_ml_csv")
    subset.coalesce(1).write.mode("overwrite").option("quoteAll", True).csv(target)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_comment", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("multiLine", True)
        .option("quote", '"')
        .csv(target)
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        F.sum(F.when(F.col("c_comment").contains("\n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_multiline"),
    )


@query(
    "scan_text_lines_roundtrip",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
                        % 1000000007) % 1000000007 AS BIGINT) AS content_checksum
        FROM documents
    """,
    tags=("E51", "E1"),
)
def scan_text_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAW TEXT round trip — the LM-corpus ingestion format: documents
    serialize one-per-line as ``doc_id \\t hex(text)`` via the text
    sink, read back with ``spark.read.text`` (each line is one
    `value` row), re-parsed with a first-tab split and hex-decoded.
    The proof is order-free: id sum, char total, and a portable
    md5-based modular content checksum must equal the source table's —
    so every byte of every document survived the newline-delimited
    encoding.  The text field is hex-armored so the contract is
    DATA-INDEPENDENT (r3 ADVICE): a document containing \\n or \\r
    would otherwise fragment into multiple lines on read-back and
    silently diverge — hex is bijective and newline/tab-free (Spark's
    base64 MIME-wraps at 76 chars, so hex is the armoring here), the
    same idea as JSONL string-escaping for binary-ish fields.

    Text files are splittable (unlike multiLine formats): at 100 TB
    this reads with full input-split parallelism, the classic reason
    raw-text corpora ship newline-delimited.  Plan: the text scan +
    one partial-aggregated global sum; no shuffle beyond the final
    single-row combine."""
    import hashlib

    d = load_table(spark, sf_dir, "documents")
    base = scratch_path(
        "potpot_textlines_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    )
    lines = d.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.hex(F.encode(F.col("text"), "UTF-8")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(base)
    back = spark.read.text(base).select(
        F.substring_index("value", "\t", 1).cast("bigint").alias("doc_id"),
        F.decode(
            F.unhex(F.expr("substring(value, instr(value, '\t') + 1)")),
            "UTF-8",
        ).alias("text"),
    )
    chk = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("bigint")
        % 1000000007
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        (F.sum(chk) % 1000000007).cast("bigint").alias("content_checksum"),
    )


@query(
    "scan_ignore_corrupt_files",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
               {dsum_expr('o_totalprice', scale=2)} AS total_price
        FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("E121", "E1"),
)
def scan_ignore_corrupt_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRUPT-FILE RESILIENCE: a directory holding a valid parquet
    file alongside a deliberately truncated/garbage one must still
    scan when ``spark.sql.files.ignoreCorruptFiles`` is set — the
    production posture for petabyte directories where one bad object
    (failed upload, bit rot) must not kill a 10-hour job.  The proof:
    counts and exact-decimal totals over the readable file equal the
    source slice, i.e. the good data survives COMPLETELY and the bad
    file contributes nothing (no partial/garbage rows).

    The PERMISSIVE-CSV op covers malformed ROWS; this covers
    malformed FILES — the other half of the ingest-resilience story.
    Plan: a normal parquet scan; the skip happens at split-read
    time."""
    import hashlib

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    base = scratch_path(
        "potpot_corrupt_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    )
    o.write.mode("overwrite").parquet(base)
    # Drop a garbage "parquet" file into the directory (stable content
    # so reruns are idempotent).
    with open(os.path.join(base, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not really a parquet file \x00\x01\x02" * 100)
    back = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(base)
        .where(F.col("o_orderstatus") == "F")
    )
    from potpot_spark.functions.numeric import dsum

    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
        dsum(F.col("o_totalprice"), scale=2).alias("total_price"),
    )


TEXT_CODECS = ("gzip", "bzip2")


@query(
    "scan_csv_compressed_roundtrip",
    oracle=f"""
        SELECT codec,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
               {dsum_expr('o_totalprice', scale=2)} AS total_price
        FROM (SELECT unnest({list(TEXT_CODECS)}) AS codec) c, orders
        WHERE o_orderstatus = 'O'
        GROUP BY codec
        ORDER BY codec
    """,
    tags=("E51", "E174"),
)
def scan_csv_compressed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-CSV round trip: the same orders slice written as
    gzip and bzip2 CSV shards, read back, and proven content-equal to
    the source (counts, key checksum, exact-decimal totals per
    codec) — the text-format sibling of the parquet-codec proof.
    The trade this documents: gzip CSV shards are NOT splittable (one
    task per shard at read — size your shards), bzip2 IS splittable
    but slow; columnar formats dominate both for analytics, which is
    why this op exists as the migration-validation gate, not a
    recommendation."""
    import hashlib

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    base = scratch_path(
        "potpot_csvz_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    )
    # Independent per-codec write jobs overlapped from a thread pool
    # (guide-of-record §2.6): bzip2's slow single-shard compression no
    # longer serializes behind gzip's — the cluster-idiom for a list of
    # independent outputs.  Files, paths and the read-back aggregate
    # are identical to the sequential form.
    def _write(codec: str) -> str:
        path = os.path.join(base, codec)
        (
            o.select("o_orderkey", "o_totalprice", "o_orderstatus")
            .write.mode("overwrite")
            .option("header", "true")
            .option("compression", codec)
            .csv(path)
        )
        return path

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(TEXT_CODECS)) as pool:
        paths = dict(zip(TEXT_CODECS, pool.map(_write, TEXT_CODECS)))
    outs = []
    for codec in TEXT_CODECS:
        path = paths[codec]
        back = (
            spark.read.option("header", "true")
            .option("inferSchema", "false")
            .csv(path)
            .select(
                F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
            )
        )
        outs.append(
            back.groupBy(F.lit(codec).alias("codec")).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
                dsum(F.col("o_totalprice"), scale=2).alias("total_price"),
            )
        )
    out = outs[0]
    for other in outs[1:]:
        out = out.unionByName(other)
    return out.orderBy("codec")


_XML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@query(
    "scan_xml_roundtrip",
    oracle="""
        SELECT doc_id, lang, text, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 5 = 0
    """,
    tags=("E1", "E2"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML connector round trip — Spark 4's NATIVE xml source (the
    spark-xml package folded into core; no reference analog — the
    reference's only format is the slotted page, SURVEY §2.1 R5-R8):
    a documents slice -> <doc> row elements -> read back with an
    explicit schema (rowTag is mandatory on both sides; inference
    would cost a second pass and type-guess every field).  Documents
    are the adversarial payload on purpose: free text containing
    markup-significant characters must survive via writer-side
    entity escaping, or the values the oracle sees diverge.  The
    reader pins ignoreSurroundingSpaces=false (r5 ADVICE: the Spark 4
    default TRIMS element text, so values with leading/trailing
    whitespace would silently round-trip modified — fixtures happen
    not to contain any, but the robustness claim must not depend on
    that).  Empty-string text would still read back as null (an XML
    empty element carries no such distinction); no fixture document
    is empty, and a production pipeline needing the distinction must
    carry an explicit is-empty attribute.  At scale
    the reader splits by row-element boundaries the same way
    JSON-lines splits by newline — per-file parallelism, no
    cross-file state."""
    src = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id", "lang", "text", F.col("n_chars").cast("bigint").alias("n_chars"))
    )
    target = os.path.join(scratch_dir("potpot_xml_"), "docs_xml")
    src.write.mode("overwrite").option("rowTag", "doc").format("xml").save(target)
    return (
        spark.read.schema(_XML_SCHEMA)
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .format("xml")
        .load(target)
    )
