"""Oracle-differential tests: every registered query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from potpot_spark import registry
from potpot_spark.testing import compare_query, duck_connection

registry.load_all()
ALL_SPECS = list(registry.specs().values())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", ALL_SPECS, ids=[s.name for s in ALL_SPECS])
def test_oracle_parity(spark, sf_dir, duck, spec):
    res = compare_query(spark, spec, sf_dir, con=duck)
    assert res.ok, str(res)
    if spec.oracle is not None:
        assert res.spark_rows == res.oracle_rows


def test_all_queries_return_rows(spark, sf_dir):
    """Driver smoke analog: every query yields a stable schema and >= 0
    rows; flagship yields > 0."""
    flagship = registry.get("agg_hash_groupby")
    assert flagship.fn(spark, sf_dir).count() > 0
