#!/usr/bin/env python3
"""Deterministically scale the TPC-H-ish testdata up by an integer factor.

Replicates fact tables K times with key-stride remapping so referential
integrity holds per replica (replica i adds i*(max_key+1) to every
primary/foreign key), leaving the dimension tables (region, nation) and the
corpus tables (documents, embeddings — whose operators are corpus-shaped,
not TPC-H-shaped) unchanged. Types are preserved bit-exactly (pyarrow
round-trip, no engine in between — events.ts is timestamp[ns], which Spark
would otherwise rewrite), and each output is a SINGLE parquet file with
bounded row groups so both Spark (range-split scans) and DuckDB
(row-group-parallel scans) read it the same way the driver-generated
testdata is read.

Usage: python3 tools/scale_up.py SRC_DIR DST_DIR FACTOR
   eg: python3 tools/scale_up.py /root/testdata/sf0.1 localdata/sf1 10
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns remapped by that table's own key stride
KEYS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
}
# stride name -> (table, column) that defines it
STRIDES = {
    "cust": ("customer", "c_custkey"),
    "ord": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
}
COPY = ["region", "nation", "documents", "embeddings"]


def scale_documents(base, factor):
    """Replicate the corpus with remapped doc_ids and a HEAVY per-replica
    token prefix (~30 repeated tokens), so duplicate structure is preserved
    WITHIN each replica but replicas of the same doc are NOT near-duplicates
    of each other (the prefix shifts ~1/4 of the token multiset: SimHash
    votes flip well past hamming 3, shingle Jaccard drops under the 0.6
    threshold). The realistic 10x-corpus shape: ~10x the duplicate
    clusters, not clusters 10x the size — a light one-token suffix was
    measured to leave replicas within near-dup range, quadratically
    inflating every cluster instead."""
    import hashlib

    stride = pc.max(base.column("doc_id")).as_py() + 1
    # Prefix key = hash of the first 40 chars: identical for exact dups AND
    # for this corpus's near-dups (which share their opening), so
    # within-replica duplicate structure survives; varied across unrelated
    # docs, so no common-token bias collides them into shared sketch buckets.
    keys = [
        int(hashlib.md5(str(t)[:40].encode()).hexdigest()[:8], 16)
        for t in base.column("text").to_pylist()
    ]
    reps = []
    for i in range(factor):
        rep = base
        idx = rep.schema.get_field_index("doc_id")
        rep = rep.set_column(
            idx, rep.schema.field(idx),
            pc.add(rep.column("doc_id"), pa.scalar(i * stride, type=rep.schema.field(idx).type)),
        )
        prefixes = pa.array(
            [
                " ".join(f"r{i:02d}t{(k * 131 + j * 37) % 9973}" for j in range(30)) + " "
                for k in keys
            ],
            type=pa.string(),
        )
        tdx = rep.schema.get_field_index("text")
        rep = rep.set_column(
            tdx, rep.schema.field(tdx),
            pc.binary_join_element_wise(
                prefixes, pc.cast(rep.column("text"), pa.string()), ""),
        )
        reps.append(rep)
    return pa.concat_tables(reps)


def scale_embeddings(base, factor, stride):
    """Replicate embeddings with vec_id += i*stride (the DOCUMENTS stride, so
    vec_id==doc_id joins stay aligned). Replica i>0 gets every vector
    circularly shifted by i positions: an identical permutation preserves
    all dot products and norms WITHIN a replica (duplicate structure
    intact), while cross-replica cosines drop to random-vector levels — the
    same ~K-times-the-clusters (not clusters-K-times-the-size) shape
    scale_documents produces for text."""
    reps = []
    for i in range(factor):
        rep = base
        idx = rep.schema.get_field_index("vec_id")
        rep = rep.set_column(
            idx, rep.schema.field(idx),
            pc.add(rep.column("vec_id"), pa.scalar(i * stride, type=rep.schema.field(idx).type)),
        )
        if i > 0:
            edx = rep.schema.get_field_index("embedding")
            typ = rep.schema.field(edx).type
            shifted = pa.array(
                [None if v is None else v[i % len(v):] + v[: i % len(v)]
                 for v in rep.column("embedding").to_pylist()],
                type=typ,
            )
            rep = rep.set_column(edx, rep.schema.field(edx), shifted)
        reps.append(rep)
    return pa.concat_tables(reps)


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale_docs = len(sys.argv) > 4 and sys.argv[4] == "--scale-docs"
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in list(KEYS) + COPY}
    if scale_docs:
        docs = scale_documents(tables["documents"], factor)
        pq.write_table(docs, f"{dst}/documents.parquet", compression="snappy",
                       row_group_size=64 * 1024)
        COPY.remove("documents")
        print(f"documents: {tables['documents'].num_rows} -> {docs.num_rows} rows (mutated)")
        # embeddings share the documents id space (vec_id == doc_id): they
        # must replicate with the SAME stride, or every replica beyond the
        # first has no matching embedding rows and embedding-join entries
        # quietly measure ~1/K of the corpus.
        doc_stride = pc.max(tables["documents"].column("doc_id")).as_py() + 1
        embs = scale_embeddings(tables["embeddings"], factor, doc_stride)
        pq.write_table(embs, f"{dst}/embeddings.parquet", compression="snappy",
                       row_group_size=64 * 1024)
        COPY.remove("embeddings")
        print(f"embeddings: {tables['embeddings'].num_rows} -> {embs.num_rows} rows (mutated)")
    stride = {
        name: pc.max(tables[t].column(c)).as_py() + 1 for name, (t, c) in STRIDES.items()
    }
    print("strides:", stride)

    for t in COPY:
        pq.write_table(tables[t], f"{dst}/{t}.parquet", compression="snappy")
        print(f"{t}: copied ({tables[t].num_rows} rows)")

    for t, remap in KEYS.items():
        base = tables[t]
        replicas = []
        for i in range(factor):
            rep = base
            for colname, sname in remap.items():
                idx = rep.schema.get_field_index(colname)
                typ = rep.schema.field(idx).type
                shifted = pc.add(rep.column(colname), pa.scalar(i * stride[sname], type=typ))
                rep = rep.set_column(idx, rep.schema.field(idx), shifted)
            replicas.append(rep)
        out = pa.concat_tables(replicas)
        pq.write_table(
            out, f"{dst}/{t}.parquet", compression="snappy", row_group_size=512 * 1024
        )
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
