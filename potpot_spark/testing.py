"""Oracle-differential test harness (SURVEY.md §5.2 item 1).

Replicates the driver's correctness gate locally: run the Spark query
and the DuckDB oracle on the same parquet, compare row count, schema
arity, and order-insensitive values.  Used by tests/test_oracle.py at
sf0.001 for fast iteration (the driver runs sf0.01).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

from potpot_spark.catalog import TABLES, table_path
from potpot_spark.registry import QuerySpec


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    notes: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        return msg + ("" if not self.notes else " | " + "; ".join(self.notes))


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for cross-engine comparability checks."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None and not (isinstance(v, float) and math.isnan(v)) else None)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort").reset_index(drop=True)
    return df


def compare_query(
    spark: SparkSession,
    spec: QuerySpec,
    sf_dir: str,
    con: duckdb.DuckDBPyConnection | None = None,
    float_rtol: float = 0.0,
) -> CompareResult:
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return CompareResult(spec.name, True, len(sdf), -1, ["rows-only (no oracle)"])
    own_con = con is None
    if own_con:
        con = duck_connection(sf_dir)
    try:
        odf = con.execute(spec.oracle).df()
    finally:
        if own_con:
            con.close()

    notes: list[str] = []
    ok = True
    if len(sdf) != len(odf):
        ok = False
        notes.append(f"row count {len(sdf)} != {len(odf)}")
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        ok = False
        notes.append(f"columns {s_cols} != {o_cols}")
    else:
        # The driver's value hash is dtype-sensitive: a Spark int64
        # column vs a DuckDB HUGEINT→float64 column hash-mismatches
        # even when every value is numerically equal (ADVICE.md r1).
        # Fail loudly on dtype-CLASS divergence so it is caught at
        # sf0.001 locally, not in the driver run.
        for c in s_cols:
            sk, ok_ = _dtype_class(sdf[c]), _dtype_class(odf[c])
            if sk != ok_:
                ok = False
                notes.append(f"col {c}: dtype class {sk} (spark) != {ok_} (oracle); {sdf[c].dtype} vs {odf[c].dtype}")
    if ok:
        s_can, o_can = _canonicalize(sdf), _canonicalize(odf)
        for c in s_can.columns:
            sv, ov = s_can[c], o_can[c]
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
                sv_f = pd.to_numeric(sv, errors="coerce").astype(float)
                ov_f = pd.to_numeric(ov, errors="coerce").astype(float)
                both_nan = sv_f.isna() & ov_f.isna()
                exact = (sv_f == ov_f) | both_nan
                if not exact.all():
                    bad = ~exact
                    if float_rtol > 0:
                        import numpy as np

                        close = np.isclose(sv_f, ov_f, rtol=float_rtol, equal_nan=True)
                        if close.all():
                            notes.append(f"col {c}: within rtol {float_rtol} but NOT exact ({int(bad.sum())} rows)")
                            continue
                    ok = False
                    i = bad.idxmax()
                    notes.append(f"col {c}: {int(bad.sum())} mismatches, e.g. row {i}: {sv_f[i]!r} != {ov_f[i]!r}")
            else:
                sv_n, ov_n = sv.isna(), ov.isna()
                eq = (sv_n & ov_n) | (sv.astype(object) == ov.astype(object))
                if not eq.all():
                    bad = ~eq
                    ok = False
                    i = bad.idxmax()
                    notes.append(f"col {c}: {int(bad.sum())} mismatches, e.g. row {i}: {sv[i]!r} != {ov[i]!r}")
    return CompareResult(spec.name, ok, len(sdf), len(odf), notes)
