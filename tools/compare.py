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
    # Primary compare is in STORED order — the driver hashes values in
    # row order, so a broken/missing ORDER BY must FAIL here, not be
    # papered over by sorting. The sorted compare below is run only
    # after a stored-order mismatch, to tell "row-order bug" apart
    # from "value bug" in the failure message.
    got, exp = got[gcols].reset_index(drop=True), exp[gcols].reset_index(drop=True)
    def first_diff(g_df, e_df):
        for i in range(len(g_df)):
            for c in gcols:
                g, e = g_df[c].iloc[i], e_df[c].iloc[i]
                gn = isinstance(g, float) and math.isnan(g) or g is None
                en = isinstance(e, float) and math.isnan(e) or e is None
                if gn and en: continue
                if isinstance(g, float) or isinstance(e, float):
                    if gn != en or abs(float(g) - float(e)) > 1e-9:
                        return (i, c, g, e)
                    # the driver hashes exact bytes: -0.0 != +0.0 there,
                    # but passes the tolerance above. Check sign at zero.
                    if float(g) == 0.0 and float(e) == 0.0 and \
                       math.copysign(1.0, float(g)) != math.copysign(1.0, float(e)):
                        return (i, c, g, e)
                elif str(g) != str(e):
                    return (i, c, g, e)
        return None
    bad = first_diff(got, exp)
    if bad:
        # diagnose: same multiset of rows in a different order, or a
        # genuine value difference? (sorted compare is diagnostic only)
        gs = got.sort_values(gcols, key=lambda s: s.astype(str)).reset_index(drop=True)
        es = exp.sort_values(gcols, key=lambda s: s.astype(str)).reset_index(drop=True)
        kind = "ROW-ORDER mismatch (values match after sort — check the query's ORDER BY)" \
            if first_diff(gs, es) is None else "value mismatch"
        print(f"[FAIL] {name}: {kind}; row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"); fails += 1
    else:
        print(f"[ ok ] {name}: {len(got)} rows")
sys.exit(1 if fails else 0)
