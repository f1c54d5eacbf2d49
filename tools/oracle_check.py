#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark result parquet, run the
oracle SQL from oracle_sql.json in DuckDB over the same testdata tables, sort
columns by name, and compare values row-by-row (after sorting rows by all
columns to be order-insensitive).
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    # pandas DataFrame -> column-name-sorted, row-sorted list of tuples
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows), list(df.columns), [str(t) for t in df.dtypes]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            import glob

            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pq.ParquetDataset(files).read().to_pandas()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            fail += 1
            continue
        g_rows, g_cols, g_types = canon(got)
        w_rows, w_cols, w_types = canon(want)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} vs {w_cols}")
            fail += 1
        elif len(g_rows) != len(w_rows):
            print(f"FAIL {name}: rowcount {len(g_rows)} vs {len(w_rows)}")
            fail += 1
        elif g_rows != w_rows:
            bad = next(i for i, (a, b) in enumerate(zip(g_rows, w_rows)) if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"   spark: {g_rows[bad]}")
            print(f"   duck : {w_rows[bad]}")
            fail += 1
        else:
            print(f"OK   {name} ({len(g_rows)} rows) [types {g_types} vs {w_types}]")
            ok += 1
    print(f"\n{ok} ok, {fail} fail; rows-only (no oracle): "
          f"{sorted(set(n.split('/')[-1] for n in __import__('os').listdir(out_dir) if '.' not in n) - set(oracle))}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
