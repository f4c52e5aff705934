#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: run Verify output
against oracle_sql.json on the same testdata tables; exact value compare
after sorting columns by name and rows by all columns."""
import sys, json, glob, math, os
import duckdb
import pandas as pd

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    # ScaleGen layouts are multi-file directories; sf0.* are single files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{verify_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        duck_df = canon(con.sql(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    if list(spark_df.columns) != list(duck_df.columns):
        fails.append((name, f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}")); continue
    for c in spark_df.columns:
        if str(spark_df[c].dtype) != str(duck_df[c].dtype):
            print(f"WARN {name}.{c}: dtype {spark_df[c].dtype} vs {duck_df[c].dtype}")
    if len(spark_df) != len(duck_df):
        fails.append((name, f"rows {len(spark_df)} vs {len(duck_df)}")); continue
    bad = None
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            a = a.astype(object); b = b.astype(object)
            neq = [(x, y) for x, y in zip(a, b)
                   if not (x == y or (isinstance(x, float) and isinstance(y, float)
                                      and (math.isnan(x) and math.isnan(y) or x == y))
                           or (x is None and y is None)
                           or (pd.isna(x) and pd.isna(y)))]
        except Exception as e:
            neq = [("cmp-error", str(e))]
        if neq:
            bad = (c, neq[:3], len(neq)); break
    if bad:
        fails.append((name, f"col {bad[0]}: {bad[2]} diffs, e.g. {bad[1]}"))
    else:
        print(f"OK   {name} ({len(spark_df)} rows)", flush=True)
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
