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
    DataSourceWriter,
    WriterCommitMessage,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from potpot_spark.catalog import load_table, table_path
from potpot_spark.registry import query
from potpot_spark.scratch import scratch_dir, scratch_path


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
            .option("checkpointLocation", scratch_dir("potpot_pyev_"))
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


class _JsonlWriter(DataSourceWriter):
    """Per-partition JSONL writer with a REAL task-level two-phase
    commit (r3 ADVICE): each task attempt writes an attempt-unique
    ``_tmp-part-<pid>-<attemptId>.jsonl`` (the ``_`` prefix makes it
    invisible to Spark/Hadoop readers even if left behind), returns a
    commit message naming its temp shard, and only the driver-side
    commit() renames the winning attempt per partition to its final
    ``part-<pid>.jsonl`` name, sweeps loser-attempt temps, and writes
    the _SUCCESS manifest.  abort() deletes every reported temp shard.
    Speculative/retried attempts therefore never race on a final file,
    and an aborted job leaves nothing a reader would ingest."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):  # type: ignore[override]
        import json as _json
        import os as _os
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        aid = ctx.taskAttemptId() if ctx else 0
        _os.makedirs(self.path, exist_ok=True)
        n = 0
        id_sum = 0
        tmp = _os.path.join(self.path, f"_tmp-part-{pid:05d}-{aid}.jsonl")
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps({"doc_id": row.doc_id, "lang": row.lang, "n_chars": row.n_chars})
                    + "\n"
                )
                n += 1
                id_sum += row.doc_id
        return WriterCommitMessage2(n, id_sum, pid, tmp)

    def _sweep_tmp(self) -> None:
        import glob as _glob
        import os as _os

        for stray in _glob.glob(_os.path.join(self.path, "_tmp-part-*.jsonl")):
            try:
                _os.remove(stray)
            except OSError:
                pass

    def commit(self, messages):  # type: ignore[override]
        import json as _json
        import os as _os

        total = 0
        id_sum = 0
        for m in messages:
            if not m:
                continue
            _os.replace(m.tmp, _os.path.join(self.path, f"part-{m.pid:05d}.jsonl"))
            total += m.n
            id_sum += m.id_sum
        # loser attempts of speculated/retried tasks never got a commit
        # message; their temps are invisible to readers but swept anyway
        self._sweep_tmp()
        with open(_os.path.join(self.path, "_SUCCESS.json"), "w") as fh:
            fh.write(_json.dumps({"rows": total, "id_sum": id_sum}))

    def abort(self, messages) -> None:  # type: ignore[override]
        import os as _os

        for m in messages:
            if m:
                try:
                    _os.remove(m.tmp)
                except OSError:
                    pass
        self._sweep_tmp()


class WriterCommitMessage2(WriterCommitMessage):
    def __init__(self, n: int, id_sum: int, pid: int, tmp: str) -> None:
        self.n = n
        self.id_sum = id_sum
        self.pid = pid
        self.tmp = tmp


class JsonlPythonSink(DataSource):
    """'pyjsonl' — Python DataSource WRITER (Spark 4): the sink-side
    twin of DocPythonSource's reader."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool):  # type: ignore[override]
        return _JsonlWriter(self.options)


@query(
    "sink_python_datasource_writer",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_checksum,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
    """,
    tags=("E154", "E2"),
)
def sink_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PYTHON DATASOURCE WRITER (Spark 4 `DataSourceWriter`): the
    documents table fans out through a custom pure-Python JSONL sink —
    one shard per partition, per-shard commit messages, a driver-side
    commit() writing the _SUCCESS manifest (the two-phase commit every
    real sink implements) — then the shards are read BACK with the
    JSON reader and checksummed against the source table.  Completes
    the Python DataSource surface: batch reader, streaming reader,
    and now the writer.

    The proof is end-to-end: counts, id/char checksums, and language
    cardinality of the ROUND-TRIPPED data must equal the source —
    shards are only as good as what can be re-read from them."""
    import hashlib
    import os as _os

    spark.dataSource.register(JsonlPythonSink)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = scratch_path(
        "potpot_pyjsonl_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    d.write.format("pyjsonl").option("path", out).mode("append").save()
    back = spark.read.json(out)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.sum("n_chars").cast("bigint").alias("chars_checksum"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
