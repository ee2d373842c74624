"""Shared materialized intermediates.

Several registered queries consume the same expensive intermediate —
the near-dup pair graph feeds dedup_ngram_jaccard AND the
connected-components clustering; the component table feeds clustering
AND keeper selection; the filtered corpus feeds the filter query AND
the training export.  A production deployment materializes each of
these ONCE per corpus version (a table, a view with a refresh job) and
every consumer reads the materialization; re-deriving the pair graph
per consumer would multiply the dominant cost of the whole pipeline.

This module is that discipline in-session: `shared_intermediate`
builds a DataFrame once per (SparkSession, sf_dir, name), pins it with
``localCheckpoint`` (computed data, lineage truncated), and hands every
later consumer the same checkpointed frame.  Results are identical to
rebuilding by construction — the checkpoint IS the built DataFrame —
so oracle parity is unaffected; only repeated work disappears.

The cache is intentionally tiny and explicit (no TTL, no size cap):
entries are aggregate-scale tables (pairs, components, filtered docs),
and a session works against a fixed corpus version.  At 100 TB the
same names become real tables with a refresh cadence.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["shared_intermediate", "clear_intermediates"]

_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_LOCK = threading.Lock()


def shared_intermediate(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the checkpointed result of ``build()``, computing it at
    most once per (session, sf_dir, name).

    Entries belonging to any other application are evicted on each call:
    a stopped session's checkpointed frames are unusable (and pinned
    executor storage while the JVM lives), and only one SparkSession is
    active at a time in this engine's deployment model.
    """
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    with _LOCK:
        for stale in [k for k in _CACHE if k[0] != app_id]:
            del _CACHE[stale]
        df = _CACHE.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        with _LOCK:
            df = _CACHE.setdefault(key, df)
    return df


def clear_intermediates() -> None:
    with _LOCK:
        _CACHE.clear()
