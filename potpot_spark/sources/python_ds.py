"""Python Data Source API (Spark 4.0+): a custom connector written in
pure Python, registered like any built-in format.

This is the engine's answer to the reference's storage layer as an
EXTENSION POINT (``/root/reference/src/storage.rs:12-25`` — a custom
paged file format only its own code can read): Spark 4 lets a
Python-defined reader participate in distributed scans, with
partition-level parallelism chosen by the source itself.  The demo
source serves parquet row groups through pyarrow — one
``InputPartition`` per row group, so a 100 TB table scans with the
same split granularity the native reader would use — but the identical
skeleton wraps ANY Python-readable system (REST pages, message-queue
offsets, proprietary formats) into a first-class parallel DataFrame
source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from potpot_spark.catalog import table_path
from potpot_spark.registry import query


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, rg: int) -> None:
        self.path = path
        self.rg = rg


class _DocReader(DataSourceReader):
    """Row-group-parallel reader: partitions() exposes one split per
    parquet row group; each executor task reads only its group and
    only the projected columns — split-level parallelism AND column
    pruning decided source-side, exactly what a scalable connector
    must own."""

    _COLUMNS = ["doc_id", "lang", "n_chars"]

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def partitions(self):  # type: ignore[override]
        import pyarrow.parquet as pq

        md = pq.read_metadata(self.path)
        return [_RowGroupPartition(self.path, i) for i in range(md.num_row_groups)]

    def read(self, part: _RowGroupPartition):  # type: ignore[override]
        import pyarrow.parquet as pq

        table = pq.ParquetFile(part.path).read_row_group(part.rg, columns=self._COLUMNS)
        # Yield Arrow RecordBatches (not tuples): the rows cross into
        # the JVM as columnar Arrow buffers with zero per-row Python —
        # the vectorized fast path of the DataSource API.
        yield from table.to_batches()


class DocPythonSource(DataSource):
    """``spark.read.format("potpot_pydocs")`` — documents via Python."""

    @classmethod
    def name(cls) -> str:
        return "potpot_pydocs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema) -> DataSourceReader:  # type: ignore[override]
        return _DocReader(self.options)


@query(
    "scan_python_datasource",
    oracle="""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("E1", "E5"),
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the documents table through the custom PYTHON data source
    (Spark 4 DataSource API) and aggregate per language — proving the
    Python-defined connector produces exactly the rows the native
    parquet reader does (the oracle reads the same file natively).

    The source hands Spark one split per parquet row group, so the
    scan parallelizes identically to the built-in reader; the rows
    flow through Arrow into the JVM and every downstream operator
    (here a hash aggregate) is standard Tungsten.  Python-per-row cost
    confines itself to the scan — the demo price of the extension
    point, amortized by split parallelism."""
    from pyspark.sql import functions as F

    spark.dataSource.register(DocPythonSource)
    df = (
        spark.read.format("potpot_pydocs")
        .option("path", table_path(sf_dir, "documents"))
        .load()
    )
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


class _EventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming reads over the events table: offsets
    are plain row positions ({"row": N}), each micro-batch serves a
    bounded slice, and readBetweenOffsets replays any committed range
    exactly — the three-method contract (initialOffset / read /
    readBetweenOffsets) that gives a Python source EXACTLY-ONCE
    semantics under checkpointing.  The identical skeleton wraps a
    REST cursor, a Kafka-less queue, or any pageable upstream."""

    _COLUMNS = ["event_id", "user_id", "event_type", "value"]

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.batch_rows = int(options.get("batchRows", "5000"))
        self._t = None

    def _table(self):
        if self._t is None:
            import pyarrow.parquet as pq

            self._t = pq.read_table(self.path, columns=self._COLUMNS)
        return self._t

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        t = self._table()
        s = start["row"]
        e = min(s + self.batch_rows, t.num_rows)
        sl = t.slice(s, e - s)
        rows = zip(*(sl.column(c).to_pylist() for c in self._COLUMNS))
        return iter(rows), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        t = self._table().slice(start["row"], end["row"] - start["row"])
        return iter(zip(*(t.column(c).to_pylist() for c in self._COLUMNS)))


class EventsPythonStreamSource(DataSource):
    """``spark.readStream.format("potpot_pyevents")``."""

    @classmethod
    def name(cls) -> str:
        return "potpot_pyevents"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:  # type: ignore[override]
        return _EventsStreamReader(self.options)


@query(
    "source_stream_python_datasource",
    oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("E4", "E5"),
)
def source_stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM from the custom Python data source: the events table
    arrives in offset-tracked 5000-row micro-batches through the
    Spark 4 SimpleDataSourceStreamReader API and aggregates statefully
    downstream — proving a Python-defined connector participates in
    Structured Streaming with offsets, checkpointing, and replay, not
    just batch scans.

    The final per-user totals must equal the batch aggregate over the
    same file (the oracle) — exactly-once across micro-batch
    boundaries, decimal accumulation making the sum order-independent
    (micro-batch arrival order differs from batch scan order!).

    Drain protocol: Python simple stream readers don't implement the
    availableNow drain contract (SupportsTriggerAvailableNow), so the
    query runs on a fast processing-time trigger and stops after a
    micro-batch reports zero input rows with the offset at the file's
    end — the bounded-backfill idiom for sources that only know "give
    me the next page"."""
    import tempfile
    import time
    import uuid as _uuid

    import pyarrow.parquet as _pq

    spark.dataSource.register(EventsPythonStreamSource)
    path = table_path(sf_dir, "events")
    # ~3 micro-batches at any SF: the multi-batch replay story without
    # per-batch overhead dominating at larger inputs
    n_rows = _pq.read_metadata(path).num_rows
    batch_rows = max(5000, -(-n_rows // 2))
    s = (
        spark.readStream.format("potpot_pyevents")
        .option("path", path)
        .option("batchRows", str(batch_rows))
        .load()
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
    )
    name = f"pyev_{_uuid.uuid4().hex[:8]}"
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            s.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="potpot_pyev_"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        drained = False
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["sources"] and p["sources"][0]["endOffset"]:
                import re as _re

                m = _re.search(r"\d+", str(p["sources"][0]["endOffset"]))
                if m and int(m.group()) >= n_rows:
                    drained = True
                    break
            time.sleep(0.1)
        q.stop()
        q.awaitTermination(30)
        if not drained:
            raise TimeoutError("python stream source did not drain in 120s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return spark.table(name).orderBy("user_id")
