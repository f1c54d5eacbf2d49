#!/usr/bin/env python3
"""DuckDB side of the criterion-shape benchmark: runs the same three
1M-row operator shapes over the parquet written by graft.CriterionBench
(/tmp/graft-criterion), 32 threads, reporting best-of-3 warm timings.

Also times every SparkEntry oracle query at a given sf dir:
  python3 tools/criterion_duckdb.py [sfDir verifyOutDir]
"""
import json
import os
import sys
import time

import duckdb

OUT = "/tmp/graft-criterion"

CDC_PROJECT = f"""
SELECT count(*) FROM (
  SELECT * FROM read_parquet('{OUT}/cdc_ledger/*.parquet')
  QUALIFY row_number() OVER (PARTITION BY pk1, pk2 ORDER BY "offset" DESC) = 1
) WHERE op NOT IN (1, 2)
"""

SNAPSHOT = f"""
WITH old AS (
  SELECT pk1, pk2, cmp1, cmp2 FROM read_parquet('{OUT}/snap_prev/*.parquet')
  QUALIFY row_number() OVER (PARTITION BY pk1, pk2 ORDER BY "offset" DESC) = 1),
new AS (SELECT * FROM read_parquet('{OUT}/snap_new/*.parquet')),
cdc AS (
  SELECT old.pk1 AS ok1, old.pk2 AS ok2, old.cmp1 AS oc1, old.cmp2 AS oc2,
         new.pk1 AS nk1, new.pk2 AS nk2, new.cmp1 AS nc1, new.cmp2 AS nc2
  FROM old FULL OUTER JOIN new ON old.pk1 = new.pk1 AND old.pk2 = new.pk2
  WHERE (old.cmp1 IS DISTINCT FROM new.cmp1) OR (old.cmp2 IS DISTINCT FROM new.cmp2))
SELECT count(*) FROM (
  SELECT 'a' FROM cdc WHERE ok1 IS NULL OR nk1 IS NULL
  UNION ALL
  SELECT 'c' FROM cdc, (VALUES (1),(2)) two(x) WHERE ok1 IS NOT NULL AND nk1 IS NOT NULL)
"""

LEDGER = f"""
SELECT count(*) FROM read_parquet('{OUT}/ledger_new/*.parquet') n
WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{OUT}/ledger_prev/*.parquet') p WHERE p.pk = n.pk)
"""

LEDGER_SMALL = f"""
SELECT count(*) FROM read_parquet('{OUT}/ledger_new_small/*.parquet') n
WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{OUT}/ledger_prev/*.parquet') p WHERE p.pk = n.pk)
"""


def bench(con, name, sql):
    con.execute(sql)  # cold/warm-up
    best = min(timed(con, sql) for _ in range(3))
    rows = con.sql(sql).fetchone()[0]
    return name, best, rows


def timed(con, sql):
    t0 = time.time()
    con.execute(sql)
    return time.time() - t0


def main():
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    out = {}
    shapes = [("cdc_project", CDC_PROJECT), ("snapshot_merge", SNAPSHOT), ("ledger_merge", LEDGER)]
    if os.path.isdir(f"{OUT}/ledger_new_small"):
        shapes.append(("ledger_merge_small", LEDGER_SMALL))
    for name, sql in shapes:
        n, t, rows = bench(con, name, sql)
        out[n] = {"warm": round(t, 4), "rows": rows}
    print("CRITERION_DUCKDB", json.dumps(out))

    if len(sys.argv) == 3:
        sf_dir, out_dir = sys.argv[1], sys.argv[2]
        con2 = duckdb.connect()
        con2.execute("SET threads TO 32")
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            con2.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        times = {}
        for name, sql in sorted(oracle.items()):
            try:
                con2.execute(sql)  # warm-up
                times[name] = round(min(timed(con2, sql) for _ in range(3)), 4)
            except Exception as e:
                times[name] = f"err: {str(e)[:60]}"
        print("ORACLE_DUCKDB", json.dumps(times))


if __name__ == "__main__":
    main()
