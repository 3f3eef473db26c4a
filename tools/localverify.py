#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet against DuckDB running the same oracle SQL
(columns sorted by name, rows sorted, values compared exactly)."""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted([p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")])
fails = 0
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name:24s} NO-OUTPUT"); fails += 1; continue
    spark_tbl = pq.read_table(files[0])
    sdf = spark_tbl.to_pandas()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(sdf)} rows " + ("OK" if len(sdf) > 0 else "EMPTY!"))
        if len(sdf) == 0: fails += 1
        continue
    try:
        ddf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE-SQL-ERROR {str(e)[:160]}"); fails += 1; continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    if list(sdf.columns) != list(ddf.columns):
        print(f"{name:24s} SCHEMA spark={list(sdf.columns)} duck={list(ddf.columns)}"); fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"{name:24s} ROWS spark={len(sdf)} duck={len(ddf)}"); fails += 1; continue
    sv = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    dv = ddf.sort_values(list(ddf.columns)).reset_index(drop=True)
    mismatch = None
    for c in sv.columns:
        a, b = sv[c], dv[c]
        try:
            eq = (a.astype(object).where(a.notna(), None) == b.astype(object).where(b.notna(), None)) | (a.isna() & b.isna())
        except Exception as e:
            mismatch = (c, f"cmp-error {e}"); break
        if not eq.all():
            i = int(eq.idxmin()); mismatch = (c, f"row {i}: spark={a[i]!r} duck={b[i]!r}"); break
    if mismatch:
        print(f"{name:24s} VALUE-MISMATCH col={mismatch[0]} {mismatch[1]}"); fails += 1
    else:
        print(f"{name:24s} OK ({len(sdf)} rows)")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(names)} queries")
sys.exit(1 if fails else 0)
