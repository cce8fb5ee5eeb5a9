#!/usr/bin/env python3
"""Dev harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query...]
Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views
over <sf_dir>/*.parquet), and compares values (columns sorted by name,
rows sorted, 1e-9 tolerance on floats).
"""
import sys, json, glob, math
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only: continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"[FAIL] {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"select * from read_parquet({files!r})").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"[FAIL] {name}: {e}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"[FAIL] {name}: cols {gcols} vs {ecols}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"[FAIL] {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # dtype-kind drift (e.g. DuckDB HUGEINT -> object/float vs Spark
    # int64) hashes differently in the driver even when values match
    # under a tolerant compare — fail it here so it can't slip through.
    kinds = [(c, got[c].dtype.kind, exp[c].dtype.kind) for c in gcols
             if got[c].dtype.kind != exp[c].dtype.kind]
    if kinds:
        print(f"[FAIL] {name}: dtype-kind mismatch {kinds}"); fails += 1; continue
    # Sort rows by all columns before the row-wise compare (per-query
    # total ORDER BY remains the determinism contract, but the compare
    # no longer silently depends on it — a missing total order shows up
    # as a value diff, not a confusing row-order artifact).
    got = got[gcols].sort_values(gcols, key=lambda s: s.astype(str)).reset_index(drop=True)
    exp = exp[gcols].sort_values(gcols, key=lambda s: s.astype(str)).reset_index(drop=True)
    bad = None
    for i in range(len(got)):
        for c in gcols:
            g, e = got[c].iloc[i], exp[c].iloc[i]
            gn = isinstance(g, float) and math.isnan(g) or g is None
            en = isinstance(e, float) and math.isnan(e) or e is None
            if gn and en: continue
            if isinstance(g, float) or isinstance(e, float):
                if gn != en or abs(float(g) - float(e)) > 1e-9:
                    bad = (i, c, g, e); break
            elif str(g) != str(e):
                bad = (i, c, g, e); break
        if bad: break
    if bad:
        print(f"[FAIL] {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"); fails += 1
    else:
        print(f"[ ok ] {name}: {len(got)} rows")
sys.exit(1 if fails else 0)
