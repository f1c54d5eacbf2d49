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


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in list(KEYS) + COPY}
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
