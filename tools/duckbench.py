#!/usr/bin/env python3
"""Judge-style differential: time every oracle SQL in DuckDB (median of 3)
on a given SF dir, and print per-query seconds + total, for comparison
against the Spark bench's per-query medians on the same queries."""
import json, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout01/oracle_sql.json"
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32

con = duckdb.connect()
con.sql(f"SET threads={threads}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
times = {}
for name, sql in sorted(oracle.items()):
    reps = []
    for _ in range(3):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
        except Exception as e:
            print(f"{name:24s} ERROR {str(e)[:120]}")
            reps = None
            break
        reps.append(time.time() - t0)
    if reps:
        times[name] = sorted(reps)[1]
print(json.dumps({"total_sec": round(sum(times.values()), 2),
                  "n": len(times),
                  "queries": {k: round(v, 3) for k, v in times.items()}}))
