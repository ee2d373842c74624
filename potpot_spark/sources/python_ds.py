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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
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
