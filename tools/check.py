#!/usr/bin/env python3
"""Local oracle-differential check mimicking the driver's compare:
run Verify output parquet vs DuckDB oracle SQL over the same tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    # sort columns by name (driver behavior), stringify values
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        rows.append("|".join(repr(v) for v in row))
    return rows

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: cols spark={sc} duck={dc}"); fails += 1; continue
    st, dt = [str(spark_df[c].dtype) for c in sc], [str(duck_df[c].dtype) for c in sc]
    a, b = canon(spark_df), canon(duck_df)
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); fails += 1; continue
    if a != b:
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        print(f"FAIL {name}: value mismatch ({len([1 for x,y in zip(a,b) if x!=y])} rows); first: {bad}")
        if st != dt: print(f"   dtypes spark={st} duck={dt}")
        fails += 1; continue
    note = "" if st == dt else f" [dtype diff spark={st} duck={dt}]"
    h = hashlib.sha256("\n".join(a).encode()).hexdigest()[:12]
    print(f"OK   {name}: {len(a)} rows hash={h}{note}")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
