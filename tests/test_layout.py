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
