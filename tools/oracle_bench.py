#!/usr/bin/env python3
"""Same-box DuckDB oracle timing: run every oracle SQL from a Verify
dump's oracle_sql.json against <sf_dir> parquet views, min of N runs
per query, print one JSON line mirroring graft.Bench's shape.

Usage: python3 tools/oracle_bench.py <verify_out_dir> <sf_dir> [runs]
"""
import sys, json, time
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracles.items()):
    best = None
    for _ in range(runs):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            dt = time.time() - t0
        except Exception:
            dt = -1.0
        best = dt if best is None else min(best, dt)
    results[name] = round(best, 6)
total = round(sum(v for v in results.values() if v > 0), 6)
qs = ",".join(f'"{k}":{v}' for k, v in results.items())
print(f'{{"metric":"oracle_total","value":{total},"unit":"sec","queries":{{{qs}}},"sf":"{sf_dir}"}}')
