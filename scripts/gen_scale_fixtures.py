#!/usr/bin/env python
"""Generate scaled-up fixture tables for the BENCH_SCALING.json
scale-proof (r10 verdict #3): every 100 TB claim in this repo rested
on plan-shape reasoning at sf <= 0.1; this script manufactures an
sfN directory (default 10x sf0.1 ~= sf1) so the top-cost cohort can
be measured at two scales and sec(sfN)/sec(sf0.1) recorded.

Scaling model — FACTOR disjoint key-offset replicas of the source
corpus (copy 0 is the identity, so sfN is a superset of the source):

- Fact/dim tables (orders, lineitem, customer, part, supplier,
  events): every key column gets copy_i * offset added, where offset
  is the smallest power of 10 above the table's max key — foreign
  keys stay consistent within a copy, so joins/graphs scale as
  FACTOR disjoint copies of the original structure (degree
  distributions preserved; |V|, |E| scale linearly).
- region/nation: fixed, TPC-H style.
- documents: doc_id offset AND the text word-rotated per copy with a
  copy marker token — replicas must NOT be near-duplicates of each
  other or banded dedup ops would see FACTOR^2 candidate blowup no
  real corpus has.
- embeddings: vec_id offset and a small deterministic per-copy
  pseudo-random perturbation (seeded by copy index) so ANN ops see
  distinct vectors, preserving scale geometry.
- events: user_id/event_id offset, same time range (FACTOR x denser
  stream — the realistic scaling for windowed aggregates).

Usage: python scripts/gen_scale_fixtures.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /root/repo/fixtures/sf1 10
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _offset(max_key: int) -> int:
    off = 10
    while off <= max_key:
        off *= 10
    return off


KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# offset source table for each key column (keys must share one offset
# with the table that owns them so FKs stay aligned)
KEY_OWNER = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/fixtures/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    tables = {
        t: pq.read_table(os.path.join(src, f"{t}.parquet"))
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    offsets: dict[str, int] = {}
    for col, owner in KEY_OWNER.items():
        own_col = KEY_COLS[owner][0] if owner != "events" else col
        # events owns both event_id and user_id with separate ranges
        src_col = col if owner in ("events",) else KEY_COLS[owner][0]
        if owner == "events":
            src_col = col
        offsets[col] = _offset(
            int(pd.Series(tables[owner][src_col].to_pandas()).max())
        )
    # FK columns share the owner's offset
    offsets["o_custkey"] = offsets["c_custkey"]
    offsets["l_orderkey"] = offsets["o_orderkey"]
    offsets["l_partkey"] = offsets["p_partkey"]
    offsets["l_suppkey"] = offsets["s_suppkey"]

    for t in ("region", "nation"):
        pq.write_table(tables[t], os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: copied fixed dim")

    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        df = tables[t].to_pandas()
        copies = []
        for i in range(factor):
            c = df.copy()
            for col in KEY_COLS[t]:
                c[col] = c[col] + i * offsets[col]
            copies.append(c)
        out = pd.concat(copies, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(out, schema=tables[t].schema, preserve_index=False),
            os.path.join(dst, f"{t}.parquet"),
        )
        print(f"{t}: {len(df)} -> {len(out)} rows")

    # documents: word-rotate per copy + marker token
    df = tables["documents"].to_pandas()
    copies = []
    for i in range(factor):
        c = df.copy()
        c["doc_id"] = c["doc_id"] + i * offsets["doc_id"]
        if i:
            def rot(text: str, k: int = i) -> str:
                w = text.split()
                r = k % max(1, len(w))
                return " ".join([f"copy{k}"] + w[r:] + w[:r])
            c["text"] = c["text"].map(rot)
            c["n_chars"] = c["text"].str.len().astype("int64")
        copies.append(c)
    out = pd.concat(copies, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=tables["documents"].schema, preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )
    print(f"documents: {len(df)} -> {len(out)} rows")

    # embeddings: per-copy deterministic perturbation
    df = tables["embeddings"].to_pandas()
    dim = len(df["embedding"].iloc[0])
    copies = []
    for i in range(factor):
        c = df.copy()
        c["vec_id"] = c["vec_id"] + i * offsets["vec_id"]
        if i:
            rng = np.random.default_rng(1000 + i)
            noise = rng.normal(0.0, 0.05, size=(len(c), dim)).astype(np.float32)
            c["embedding"] = [
                (np.asarray(v, dtype=np.float32) + n).tolist()
                for v, n in zip(c["embedding"], noise)
            ]
        copies.append(c)
    out = pd.concat(copies, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=tables["embeddings"].schema, preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
    )
    print(f"embeddings: {len(df)} -> {len(out)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
