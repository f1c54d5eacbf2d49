#!/usr/bin/env python3
"""Time classic-SQL oracle queries in DuckDB over a testdata dir.

The DuckDB half of the same-window Spark/DuckDB pairing recorded in
BASELINE.md: views over the parquet tables, one warmup run, then
best-of-N wall times per query.

Usage: python3 tools/classic_duckdb.py SF_DIR ORACLE_SQL_JSON q1,q3,... [N]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_json, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sqls = json.load(open(sql_json))
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = {}
    for name in names:
        sql = sqls[name]
        con.execute(sql).fetchall()  # warm (page cache + plan)
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
