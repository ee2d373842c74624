from __future__ import annotations

import os

import pytest

from potpot_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("potpot_tests", shuffle_partitions=8)
    yield s
    from potpot_spark.materialize import clear_intermediates

    clear_intermediates()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    """Default sweep scale.  POTPOT_SF=sf0.01 runs the whole suite —
    including the full 412-query oracle sweep — at the driver's
    correctness scale (r3 verdict #4: kills the sf0.001-only blind
    spot); unset keeps the fast sf0.001 default for iteration."""
    sf = os.environ.get("POTPOT_SF")
    return f"/root/testdata/{sf}" if sf else SF_SMOKE
