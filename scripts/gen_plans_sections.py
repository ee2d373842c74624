#!/usr/bin/env python
"""One-shot generator for PLANS.md sections (r7 verdict #8: every
query whose sf0.1 median exceeds 2 s must carry a PLANS.md section).

For each requested query: capture the formatted physical-plan TREE at
sf0.001 (tree only — the node-by-node detail of a 30-node plan adds
bulk, not evidence), and emit a section skeleton whose **Look for:**
line is seeded from the operator's own design docstring (the "Plan:" /
"100 TB:" paragraphs) plus the r7 in-suite median.  The skeletons are
then hand-edited before committing — the generator exists so the plan
dumps are real, not transcribed.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potpot_spark import registry
from potpot_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


def plan_tree(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # keep the tree block: from "== Physical Plan ==" to the first
    # blank line that precedes the "(1) ..." node details
    m = re.search(r"== Physical Plan ==\n(.*?)\n\n", text, re.S)
    return m.group(1) if m else text.strip()


def doc_excerpt(fn) -> str:
    doc = fn.__doc__ or ""
    # the Plan:/100 TB: sentences are the scale rationale
    flat = " ".join(doc.split())
    out = []
    for key in ("Plan:", "100 TB:", "Exact:"):
        i = flat.find(key)
        if i >= 0:
            out.append(flat[i : i + 500])
    return "\n".join(out) if out else flat[:400]


def newest_bench_detail() -> str:
    """Newest BENCH_DETAIL_r*.json in the repo root, resolved relative
    to this script (NOT the cwd) — mirrors the glob discipline in
    tests/test_docs.py::test_plans_md_covers_every_slow_query so the
    skeletons always cite the latest round's medians."""
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "BENCH_DETAIL_r[0-9]*.json")))
    if not paths:
        raise FileNotFoundError("no BENCH_DETAIL_r*.json in repo root")
    return paths[-1]


def main() -> int:
    names = sys.argv[1:]
    spark = get_session("potpot_plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    detail_path = newest_bench_detail()
    rtag = re.search(r"BENCH_DETAIL_(r\d+)", detail_path).group(1)
    with open(detail_path) as f:
        medians = {k: v["median"] for k, v in json.load(f)["queries"].items()}
    for name in names:
        spec = registry.specs()[name]
        df = spec.fn(spark, SF_DIR)
        print(f"## {name}\n")
        print(f"**{rtag} sf0.1 median:** {medians.get(name, '?')} s\n")
        print(f"**Docstring rationale:** {doc_excerpt(spec.fn)}\n")
        print("```")
        print(plan_tree(df))
        print("```\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
