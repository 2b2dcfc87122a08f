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

With --embed-factor N, the EMBEDDINGS table replicates N times instead
of `factor` (the other tables keep `factor`): the ANN family needs a
corpus two orders past the doc count before partition pruning and PQ
memory wins register (round-10 verdict item 6). Replicas i>=1 get a
deterministic per-(replica, vec_id, dim) float perturbation, so the
scaled corpus has DISTINCT geometry (no exact-duplicate vectors — an
ANN index over 100 copies of every point answers nothing about scale).
Vectors beyond the documents' id span simply never join on the
cross-modal path; vector-only queries see the full corpus. The noise
is a closed form of the ids — re-running reproduces the fixture
byte-for-byte.

Usage: python3 tools/make_scaled_fixture.py <src_sf_dir> <out_dir> [factor] [--declone] [--embed-factor N]
"""
import sys

import numpy as np
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


def perturb_embeddings(table, rep):
    """Deterministic distinct-geometry noise for embedding replica
    `rep`: flat float32 add of ((id*31 + rep*17 + dim*13) mod 1009 −
    504) / 5e4 per coordinate — a closed form of (rep, ORIGINAL vec_id,
    dim), applied before the id offset. Magnitude ~1% of coordinate
    scale: neighborhoods stay label-coherent, exact ties disappear."""
    idx = table.schema.get_field_index("embedding")
    col = table.column("embedding").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    dim = offsets[1] - offsets[0]
    # the flat-buffer arithmetic below assumes a non-sliced child and
    # uniform list lengths — a ragged or sliced embedding column would
    # silently misalign the noise rather than fail, so assert both
    assert offsets[0] == 0, "sliced embedding buffer (offsets[0] != 0)"
    assert (np.diff(offsets) == dim).all(), \
        "ragged embedding column: per-row dims differ"
    ids = table.column("vec_id").to_numpy(zero_copy_only=False)
    dim_idx = np.tile(np.arange(dim, dtype=np.int64), len(ids))
    vid = np.repeat(ids, dim)
    noise = (((vid * 31 + rep * 17 + dim_idx * 13) % 1009) - 504)
    flat = flat + (noise / 50000.0).astype(np.float32)
    arr = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, type=pa.float32()))
    return table.set_column(
        idx, table.schema.field(idx), arr.cast(table.schema.field(idx).type))

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
    embed_factor = None
    if "--embed-factor" in args:
        i = args.index("--embed-factor")
        embed_factor = int(args[i + 1])
        del args[i:i + 2]
    # --tables a,b,c: scale ONLY the named tables; everything else is
    # copied verbatim (factor 1). The SF-10 point scales the pipeline
    # tables (events/documents/embeddings) without materializing a
    # 60M-row lineitem nobody gates there.
    only_tables = None
    if "--tables" in args:
        i = args.index("--tables")
        only_tables = set(args[i + 1].split(","))
        del args[i:i + 2]
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
        if not cols or (only_tables is not None
                        and table not in only_tables):
            pq.write_table(t, f"{out}/{table}.parquet")
            print(f"{table}: copied verbatim ({t.num_rows} rows)")
            continue
        table_factor = (embed_factor
                        if table == "embeddings" and embed_factor
                        else factor)
        reps = []
        for i in range(table_factor):
            r = t
            if table == "embeddings" and i > 0 and embed_factor:
                r = perturb_embeddings(r, i)
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
