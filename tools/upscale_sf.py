#!/usr/bin/env python
"""Measurement-only upscaler: replicate an SF dir K times with shifted
keys so bench-style timings can be taken at driver scale (the driver
generates its own sf1.0; /root/testdata tops out at sf0.1).

NOT part of any correctness gate — the oracle contract runs on the
driver's own sf0.01/sf0.1 data.  Replica i shifts every entity key by
i*KEY_BASE (joins stay consistent within a replica and never cross
replicas) and suffixes document text with a per-replica token so exact
and near-dup groups do not collapse 10-for-1 across replicas.

Usage: python tools/upscale_sf.py [src_dir] [dst_dir] [k]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_BASE = 10_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def upscale(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in COPY_ONLY:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: copied {tbl.num_rows}")
    for t, cols in SHIFT_COLS.items():
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        parts = []
        for i in range(k):
            rep = tbl
            for c in cols:
                idx = rep.schema.get_field_index(c)
                shifted = pc.add(rep.column(c), pa.scalar(
                    i * KEY_BASE, type=rep.schema.field(c).type))
                rep = rep.set_column(idx, rep.schema.field(c), shifted)
            if t == "documents" and i > 0:
                idx = rep.schema.get_field_index("text")
                txt = pc.binary_join_element_wise(
                    pc.cast(rep.column("text"), pa.string()),
                    pa.scalar(f"replica{i}"), " ")
                rep = rep.set_column(idx, rep.schema.field("text"), txt)
            parts.append(rep)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"),
                       row_group_size=1 << 20)
        print(f"{t}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_x10/sf1.0"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upscale(src, dst, k)
