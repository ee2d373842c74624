"""Query registry — the single source of truth for ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers itself here with:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first impl)
  - optionally, an ANSI-SQL oracle string for DuckDB (the driver's
    correctness gate).  Operators whose semantics are not
    SQL-expressible (approximate sketches, Spark-seeded hashing, LSH)
    register ``oracle=None`` and get a weaker rows-only check —
    mirroring the reference's own "tests-as-spec" style where exact
    assertions exist only where exactness is defined
    (``/root/reference/src/hashtable.rs:382-418``).

Oracle-parity rules (enforced by convention here, verified in tests):
  - every computed column is aliased identically on both sides;
  - double SUM/AVG go through exact DECIMAL accumulation and a final
    cast to double, so results are independent of summation order
    (Spark and DuckDB otherwise sum partitions in different orders);
  - timestamp columns are compared at microsecond precision (Spark
    truncates parquet ns -> us on read);
  - ``LIMIT``/top-k queries always carry a deterministic tie-break key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "query", "all_queries", "all_oracles", "get", "load_all"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return self.fn.__doc__ or ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that populate the registry on import.
_OPERATOR_MODULES = [
    "potpot_spark.sources.scan",
    "potpot_spark.sources.sink",
    "potpot_spark.sources.formats",
    "potpot_spark.sources.layout",
    "potpot_spark.sources.python_ds",
    "potpot_spark.operators.relational",
    "potpot_spark.operators.joins",
    "potpot_spark.operators.tpch",
    "potpot_spark.operators.tpch_suite",
    "potpot_spark.operators.aggregates",
    "potpot_spark.operators.stats",
    "potpot_spark.operators.reshape",
    "potpot_spark.operators.sampling",
    "potpot_spark.operators.windows",
    "potpot_spark.operators.windows_ext",
    "potpot_spark.operators.skew",
    "potpot_spark.operators.timeseries",
    "potpot_spark.operators.asof",
    "potpot_spark.operators.dedup",
    "potpot_spark.operators.graph",
    "potpot_spark.operators.pipeline",
    "potpot_spark.operators.misc_sql",
    "potpot_spark.operators.ddl",
    "potpot_spark.operators.caching",
    "potpot_spark.operators.similarity",
    "potpot_spark.operators.ivf",
    "potpot_spark.operators.text",
    "potpot_spark.operators.multimodal",
    "potpot_spark.operators.ml_features",
    "potpot_spark.functions.scalars",
    "potpot_spark.functions.constraints",
    "potpot_spark.streaming.windows",
    "potpot_spark.streaming.stateful",
    "potpot_spark.streaming.joins",
]

_loaded = False


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a ``(spark, sf_dir) -> DataFrame`` operator."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    load_all()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]


def specs() -> dict[str, QuerySpec]:
    load_all()
    return dict(_REGISTRY)
