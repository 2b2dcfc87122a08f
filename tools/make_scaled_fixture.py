#!/usr/bin/env python3
"""Deterministic xN replication of a testdata SF dir — the SF-1 soak
fixture (SCALE.md gets its first measured point past sf0.1 from this).

Each table is replicated `factor` times with id-column offsets chosen
so key spaces stay disjoint and foreign keys stay consistent within a
replica (customer/orders/lineitem key chains, events user/event ids,
document/vector ids). Dimension tables (region, nation) and all
non-key payload columns are byte-identical per replica; pyarrow
concat preserves the exact column types of the source fixture.

Usage: python3 tools/make_scaled_fixture.py <src_sf_dir> <out_dir> [factor]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table id columns to offset, with the table whose key range sizes
# the offset stride (None = own column's max+1)
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# the key chain: an FK column strides by ITS REFERENCED table's span.
# vec_id strides by the DOCUMENTS span: embeddings.vec_id corresponds
# to documents.doc_id (the cross-modal join key), so replica i's
# vectors must land beside replica i's documents or every cross-modal
# query runs over garbled pairs
STRIDE_SOURCE = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "vec_id": ("documents", "doc_id"),
}


def main():
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)
    strides = {}

    def stride(table, col):
        key = (table, col)
        if key not in strides:
            t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
            strides[key] = int(pc.max(t.column(col)).as_py()) + 1
        return strides[key]

    for table, cols in OFFSETS.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        if not cols:
            pq.write_table(t, f"{out}/{table}.parquet")
            print(f"{table}: dimension table copied ({t.num_rows} rows)")
            continue
        reps = []
        for i in range(factor):
            r = t
            for c in cols:
                st, sc = STRIDE_SOURCE.get(c, (table, c))
                off = i * stride(st, sc)
                idx = r.schema.get_field_index(c)
                typ = r.schema.field(idx).type
                shifted = pc.cast(pc.add(r.column(c), off), typ)
                r = r.set_column(idx, r.schema.field(idx), shifted)
            reps.append(r)
        scaled = pa.concat_tables(reps)
        pq.write_table(scaled, f"{out}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {scaled.num_rows} rows")


if __name__ == "__main__":
    main()
