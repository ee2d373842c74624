"""Doc-drift guard (r3 verdict #7): the operator counts README.md and
SURVEY.md advertise must equal the live registry — commit-message
totals drifted 400→405→410→412 during r3, so the claim is now tested."""

from __future__ import annotations

import pathlib

from potpot_spark import registry

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_readme_operator_count_matches_registry():
    registry.load_all()
    n = len(registry.specs())
    readme = (ROOT / "README.md").read_text()
    assert f"**{n} operators**" in readme, (
        f"README.md operator count is stale: registry has {n}"
    )


def test_survey_shipped_count_matches_registry():
    registry.load_all()
    n = len(registry.specs())
    survey = (ROOT / "SURVEY.md").read_text()
    assert f"Shipped: {n} `queries()` keys" in survey, (
        f"SURVEY.md §7 shipped count is stale: registry has {n}"
    )


def test_oracle_coverage_claim_matches_registry():
    """Exactly the declared trained-index ANN outputs are rows-only;
    everything else must carry a DuckDB value oracle."""
    registry.load_all()
    specs = registry.specs()
    rows_only = [name for name, s in specs.items() if s.oracle is None]
    assert sorted(rows_only) == [
        "sim_search_ivf",
        "sim_search_ivfpq_adc",
        "sim_search_pq_adc",
    ], rows_only
