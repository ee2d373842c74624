#!/usr/bin/env python
"""Touched-vs-untouched drift control for the r12 optimization round
(the r11 discipline): compare BENCH_DETAIL_r12_OPT_BASELINE.json
against BENCH_DETAIL_r12_OPT_AFTER.json, summing medians/mins over the
keys this round's commits changed vs the identical-code remainder.

Usage: python scripts/drift_control_r12.py
"""
from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# query keys whose plans this round changed (code-touched cohort)
TOUCHED = [
    "graph_scc_condensation",
    "ml_knn_classifier_eval",
    "graph_eigenvector_centrality",
    "stats_bh_fdr_correction",
    "text_trigram_name_similarity",
    "text_trigram_collapse_staged",       # shares _trgm_similar_pairs
    # connected_components pointer jump — every registered consumer
    # (several read the once-per-session dedup_cc_components shared
    # intermediate, so their marginal cost may not move; they are in
    # the touched cohort because their code path changed):
    "dedup_connected_components",
    "dedup_cluster_size_distribution",
    "dedup_keep_canonical",
    "pipeline_corpus_filter",
    "pipeline_dedup_rate_report",
    "dedup_semantic_keeper",
    "ml_dbscan_grid_2d",
]


def load(name: str) -> dict:
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def main() -> int:
    base = load("BENCH_DETAIL_r12_OPT_BASELINE.json")
    after = load("BENCH_DETAIL_r12_OPT_AFTER.json")
    bq, aq = base["queries"], after["queries"]
    touched = [k for k in TOUCHED if k in bq and k in aq]
    untouched = [k for k in bq if k in aq and k not in TOUCHED]

    def sums(keys, m):
        return (
            round(sum(bq[k][m] for k in keys), 1),
            round(sum(aq[k][m] for k in keys), 1),
        )

    out = {"n_touched": len(touched), "n_untouched": len(untouched)}
    for m in ("median", "min"):
        b, a = sums(touched, m)
        out[f"touched_{m}_sum"] = [b, a, round(100 * (a / b - 1), 1)]
        b, a = sums(untouched, m)
        out[f"untouched_{m}_sum"] = [b, a, round(100 * (a / b - 1), 1)]
    out["headline"] = [base["value"], after["value"]]
    out["shared_build"] = [base["shared_build_sec"], after["shared_build_sec"]]
    out["iso_substituted"] = [
        base["n_isolated_substituted"], after["n_isolated_substituted"]
    ]
    out["sum_isolated_where_flagged"] = [
        base["sum_isolated_where_flagged_sec"],
        after["sum_isolated_where_flagged_sec"],
    ]
    print(json.dumps(out, indent=1))
    for k in touched:
        print(
            f"{k:40s} med {bq[k]['median']:7.2f} -> {aq[k]['median']:7.2f}"
            f"   min {bq[k]['min']:6.2f} -> {aq[k]['min']:6.2f}"
            f"   iso {bq[k].get('isolated','-')} -> {aq[k].get('isolated','-')}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
