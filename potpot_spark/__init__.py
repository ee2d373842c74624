"""potpot_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference storage engine ``jcdyer/potpot`` (see ``SURVEY.md``).  The
reference is an embryonic single-node embedded storage engine (paged
file + buffer pool + slotted pages + hash index, ``query::insert`` /
``query::get`` stubs at ``/root/reference/src/query.rs:3-9``); this
package expresses the same *capabilities* — durable append, point
access, hash-keyed access — analytically on Spark DataFrames, and adds
the full analytical operator inventory declared in ``SURVEY.md §2``.

Layout:
    session     SparkSession factory with scale-aware defaults
    catalog     test-table registration (parquet dirs -> temp views)
    registry    the query registry driving ``__spark_entry__.py``
    operators/  relational + pipeline operators (joins, aggs, windows,
                dedup, similarity, as-of, ...)
    sources/    scan / sink operators
    functions/  scalar-function surface + constraint checks
    streaming/  Structured Streaming operators over the events table
    plans/      plan-inspection helpers (pushdown / broadcast asserts)
"""

from potpot_spark.session import get_session
from potpot_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_session", "TABLES", "load_tables", "register_views"]
__version__ = "0.1.0"
