"""Stage a work-dominated bench directory by replicating the sf0.1 tables.

The staged testdata tops out at sf0.1 (~17 MB), where most headline
queries finish in under 100 ms of REAL work — Spark's fixed ~0.1 s/query
local-mode scheduling floor then dominates every ratio against an
embedded engine.  This tool fabricates a larger scale inside the repo
(default 5×, "sf0.5-equivalent") by unioning N copies of each FACT table
with key offsets, so per-query work rises to where engine throughput —
not job-launch overhead — decides the comparison.

Replication semantics (deterministic, join-preserving):

- fact tables (orders, lineitem, customer, events, documents,
  embeddings): copy i offsets every PK/FK in the copied key space by
  i·10^7 — joins stay internally consistent, aggregates scale linearly.
- dimension tables (nation, region, part, supplier) are copied verbatim:
  dimensions do not grow with fact volume in a warehouse, and the
  fact→dim FKs (c_nationkey, l_partkey, …) are left unoffset on purpose.
- pyarrow end-to-end: schemas (incl. events' TIMESTAMP(NANOS)) survive
  byte-exact, so the engine and the DuckDB oracle read the same types as
  at sf0.1.

Duplicated documents/embeddings make clone pairs: the dedup/similarity
queries then find MORE near-dup structure (every doc has N-1 exact
clones), i.e. strictly more candidate-pair work — the right direction
for a work-dominated bench.

Usage: python tools/make_bench_sf.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000

# table -> columns to offset per copy (keys in the scaled space)
FACT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "part", "supplier"]


def scale_table(name: str, copies: int, out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    parts = [t]
    for i in range(1, copies):
        c = t
        for col in FACT_KEYS[name]:
            idx = c.schema.get_field_index(col)
            shifted = pc.add(c.column(col), pa.scalar(i * OFFSET, type=c.schema.field(col).type))
            c = c.set_column(idx, c.schema.field(col), shifted)
        parts.append(c)
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    return out.num_rows


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_data", "sf0.5"
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name:12s} {t.num_rows:>9} rows (dim, verbatim)")
    for name in FACT_KEYS:
        n = scale_table(name, copies, out_dir)
        print(f"{name:12s} {n:>9} rows ({copies} copies)")
    print(f"staged: {out_dir}")


if __name__ == "__main__":
    main()
