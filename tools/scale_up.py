#!/usr/bin/env python3
"""Build an sf1-equivalent scaling dataset by replicating sf0.1 with
id-shifted copies (10x: lineitem 600k -> 6M = TPC-H sf1 row counts).

Usage: python3 tools/scale_up.py [/root/testdata/sf0.1] [/tmp/sfbig] [10]

Key columns are shifted per replica so FK joins scale (each replica is
a disjoint id universe joined to the SAME shared dims region/nation);
all non-key payloads (text, embeddings, timestamps, prices) are copied
verbatim, preserving parquet types exactly (pyarrow, no engine reads).
Document/embedding replicas therefore form 10-cliques of exact
near-dups -- deliberate: duplicate inflation is what a scaled web
corpus looks like, and it stresses the dedup tier's quadratic vs
capped paths exactly where they differ.

Dev tool only -- NOT part of the Scala engine.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: per-replica shift}; tables absent here are copied 1x
SHIFTS = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_1X = ["region", "nation"]


def replicate(src: str, dst: str, factor: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    for t in COPY_1X:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{dst}/{t}.parquet")
        print(f"{t}: copied 1x")
    for t, shifts in SHIFTS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for k in range(factor):
            cols = []
            for name in base.column_names:
                col = base.column(name)
                if name in shifts and k > 0:
                    col = pc.add(col, k * shifts[name]).cast(col.type)
                cols.append(col)
            copies.append(pa.table(cols, schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    replicate(src, dst, factor)
