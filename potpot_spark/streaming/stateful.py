"""Custom stateful streaming operator (SURVEY.md §2.9: E33).

``applyInPandasWithState`` — the engine's escape hatch for operators
Structured Streaming lacks natively.  State here is a per-user running
event count; each micro-batch updates the count and emits the new
value.  This is the pattern a custom sketch / sessionizer / CDC
reducer would use at scale: state lives in the state store partitioned
by key, Python sees Arrow batches per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from potpot_spark.registry import query
from potpot_spark.streaming.runner import run_to_batch, stream_events

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _update_count(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (count,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})


@query(
    "stream_stateful_count",
    oracle="SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
    tags=("E33",),
)
def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E33 — arbitrary stateful processing: running per-user event
    count via applyInPandasWithState.  availableNow may split the
    input into several micro-batches, each emitting an updated count;
    the final (= maximum, counts are monotone) value per user is the
    batch-equivalent answer the oracle checks."""
    s = stream_events(spark, sf_dir).select("user_id", "ts")
    counted = s.groupBy("user_id").applyInPandasWithState(
        _update_count,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_batch(counted, output_mode="update")
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
