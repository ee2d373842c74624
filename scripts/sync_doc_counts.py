#!/usr/bin/env python
"""Rewrite the operator counts README.md and SURVEY.md advertise from
the live registry (the counts tests/test_docs.py pins).  Run this
before any snapshot commit that added operators — r5's snapshot
skipped the manual sync and shipped a red doc gate.
"""
from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, "/root/repo")

from potpot_spark import registry

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    registry.load_all()
    specs = registry.specs()
    n = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)

    readme = ROOT / "README.md"
    s = readme.read_text()
    s2 = re.sub(r"\*\*\d+ operators\*\*, \d+ of them",
                f"**{n} operators**, {n_oracle} of them", s)
    if s2 != s:
        readme.write_text(s2)
        print(f"README.md: synced to {n} operators / {n_oracle} oracled")

    survey = ROOT / "SURVEY.md"
    s = survey.read_text()
    s2 = re.sub(r"Shipped: \d+ `queries\(\)` keys",
                f"Shipped: {n} `queries()` keys", s)
    s2 = re.sub(r"\n(\d+) with DuckDB oracles", f"\n{n_oracle} with DuckDB oracles", s2)
    if s2 != s:
        survey.write_text(s2)
        print(f"SURVEY.md: synced to {n} keys / {n_oracle} oracled")
    print(f"registry: {n} keys, {n_oracle} oracled")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
