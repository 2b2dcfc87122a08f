#!/usr/bin/env python3
"""Deterministic xN replication of a testdata SF dir — the SF-1 soak
fixture (SCALE.md gets its first measured point past sf0.1 from this).

Each table is replicated `factor` times with id-column offsets chosen
so key spaces stay disjoint and foreign keys stay consistent within a
replica (customer/orders/lineitem key chains, events user/event ids,
document/vector ids). Dimension tables (region, nation) and all
non-key payload columns are byte-identical per replica; pyarrow
concat preserves the exact column types of the source fixture.

With --declone, replicas i>=1 of the DOCUMENTS table get deterministic
token noise (every 4th token, phase-shifted by doc_id and replica,
replaced by a replica-tagged synthetic token): replicas are then
neither exact nor near duplicates of their originals (3-gram shingle
overlap drops far below any pairing threshold), so the near-dup family
is measured in its df-cap (linear) regime instead of the
clone-quadratic regime the plain fixture deliberately exercises. The
noise is a pure function of (replica, doc_id, position) — re-running
the tool reproduces the fixture byte-for-byte.

Usage: python3 tools/make_scaled_fixture.py <src_sf_dir> <out_dir> [factor] [--declone]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def declone_texts(texts, doc_ids, rep):
    """Perturb ~25% of tokens, deterministically per (rep, doc, pos)."""
    out = []
    for t, d in zip(texts, doc_ids):
        toks = t.split(" ")
        for p in range(len(toks)):
            if (p + d + rep) % 4 == 0:
                toks[p] = f"z{rep}r{(p + d) % 7}"
        out.append(" ".join(toks))
    return out

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
    declone = "--declone" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--declone"]
    src, out = args[0], args[1]
    factor = int(args[2]) if len(args) > 2 else 10
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
            if declone and table == "documents" and i > 0:
                tidx = r.schema.get_field_index("text")
                noisy = declone_texts(
                    r.column("text").to_pylist(),
                    t.column("doc_id").to_pylist(), i)
                r = r.set_column(tidx, r.schema.field(tidx),
                                 pa.array(noisy, type=r.schema.field(tidx).type))
            reps.append(r)
        scaled = pa.concat_tables(reps)
        pq.write_table(scaled, f"{out}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {scaled.num_rows} rows")


if __name__ == "__main__":
    main()
