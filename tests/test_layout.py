"""Physical-layout tests (sources/layout.py, sources/formats.py): the
properties that make these sinks worth using at 100 TB — partition
pruning actually prunes, co-bucketed joins actually skip the shuffle."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from potpot_spark import registry
from potpot_spark.catalog import load_table
from potpot_spark.plans.inspect import formatted_plan

registry.load_all()


def test_partitioned_write_prunes_directories(spark, sf_dir):
    """A filter on the partition column must become a PartitionFilter
    (directory skip), not a row-level parquet filter."""
    src = load_table(spark, sf_dir, "orders")
    target = os.path.join(tempfile.mkdtemp(prefix="potpot_prunetest_"), "by_status")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(target)
    back = spark.read.parquet(target).where(F.col("o_orderstatus") == "F")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0], plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """The co-bucketed join plan must contain no shuffle exchange —
    bucket placement replaces it (SelectedBucketsCount in scan)."""
    df = registry.get("sink_bucketed_join_noshuffle").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # no exchange may feed the join (the only allowed exchange is the
    # final groupBy one above the join)
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan


def test_csv_roundtrip_schema_is_explicit(spark, sf_dir):
    df = registry.get("scan_csv_roundtrip").fn(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    ]
    assert df.schema["o_totalprice"].dataType.typeName() == "double"


def test_json_roundtrip_preserves_props_string(spark, sf_dir):
    df = registry.get("scan_json_roundtrip").fn(spark, sf_dir)
    assert df.schema["props"].dataType.typeName() == "string"
    assert df.count() > 0


def test_zorder_files_prune_on_both_dims(spark, sf_dir):
    """The Z-order layout's point: each file's (partkey, suppkey)
    min/max envelope is tight on BOTH dimensions, so the 2-D box
    touches only a minority of files.  A single-column sort could
    prune only its own dimension."""
    import pyarrow.parquet as pq
    import glob as _glob

    from potpot_spark.sources.layout import write_zorder_lineitem

    target = write_zorder_lineitem(spark, sf_dir)
    files = sorted(_glob.glob(f"{target}/part-*.parquet"))
    assert len(files) >= 8, files
    overlapping = 0
    for f in files:
        md = pq.read_metadata(f)
        mins = {c: None for c in ("l_partkey", "l_suppkey")}
        maxs = {c: None for c in ("l_partkey", "l_suppkey")}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        # box: l_partkey in [256, 511], l_suppkey in [32, 47]
        if mins["l_partkey"] <= 511 and maxs["l_partkey"] >= 256 and \
           mins["l_suppkey"] <= 47 and maxs["l_suppkey"] >= 32:
            overlapping += 1
    assert overlapping < len(files) / 2, (
        f"{overlapping}/{len(files)} files overlap the box — Z-order "
        "should confine the box to a minority of file envelopes"
    )
