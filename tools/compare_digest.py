#!/usr/bin/env python3
"""Order-independent EXACT digest compare for scale-run oracle checks.

compare.py (the driver-replica) materializes both sides into pandas and
zip-compares rows — fine at sf0.01/sf0.1, hopeless at sf10 where a single
query's output is ~15M rows. This variant never materializes a result:
both sides are reduced INSIDE DuckDB to

    (n_rows, sum(hash(row)), min(hash(row)), max(hash(row)))

where `row` is the struct of all columns IN SORTED COLUMN ORDER, each
CAST to VARCHAR (both sides render through the same DuckDB formatter, so
bit-identical values digest identically regardless of parquet physical
type). Digest equality == exact multiset equality of the rendered rows,
up to 64-bit hash-collision masking (sum+min+max over one query makes a
masked diff astronomically unlikely, and any row-count diff is caught
outright).

Usage: compare_digest.py <verify_dir> <sf_dir> [q1,q2,...]
"""
import sys, json, glob, os
import duckdb

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}

con = duckdb.connect()
# scale sweeps bound the replay explicitly (in-memory connections spill
# to cwd/.tmp and default to ~80% of RAM — unbounded while Spark shares
# the box); unset → DuckDB defaults, as before
if os.environ.get("DIGEST_MEMORY_LIMIT"):
    con.sql(f"SET memory_limit='{os.environ['DIGEST_MEMORY_LIMIT']}'")
if os.environ.get("DIGEST_TEMP_DIR"):
    os.makedirs(os.environ["DIGEST_TEMP_DIR"], exist_ok=True)
    con.sql(f"SET temp_directory='{os.environ['DIGEST_TEMP_DIR']}'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

def digest(rel_sql, cols):
    # coalesce keeps NULLs positional (concat_ws SKIPS nulls, which would
    # alias ('x', NULL) with (NULL, 'x')); \x1e is the null sentinel,
    # \x1f the field separator. That neither occurs in rendered values is
    # ENFORCED, not assumed: the same scan aggregates a violation flag
    # over every VARCHAR column (a value containing the separators could
    # alias distinct rows, e.g. ('a\x1fb','c') vs ('a','b\x1fc')).
    row = "hash(concat_ws('\x1f', " + ", ".join(
        f'COALESCE(CAST("{c}" AS VARCHAR), \'\x1e\')' for c in cols) + "))"
    types = dict(
        (r[0], r[1]) for r in con.sql(f"DESCRIBE ({rel_sql})").fetchall())
    vcols = [c for c in cols if "VARCHAR" in types.get(c, "")]
    viol = (" OR ".join(
        f"contains(\"{c}\", '\x1f') OR contains(\"{c}\", '\x1e')"
        for c in vcols) or "FALSE")
    q = (f"SELECT count(*) AS n, sum({row}) AS s, min({row}) AS lo, "
         f"max({row}) AS hi, max(CASE WHEN {viol} THEN 1 ELSE 0 END) AS v "
         f"FROM ({rel_sql})")
    n, s, lo, hi, v = con.sql(q).fetchone()
    assert not v, ("digest separator byte found in a VARCHAR value; "
                   "the concat_ws row rendering is not injective here")
    return (n, None if s is None else int(s) % (1 << 64), lo, hi)

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{verify_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    spark_src = f"SELECT * FROM read_parquet('{verify_dir}/{name}/*.parquet')"
    cols = [r[0] for r in con.sql(f"DESCRIBE ({spark_src})").fetchall()]
    ocols = [r[0] for r in con.sql(f"DESCRIBE ({oracle[name]})").fetchall()]
    if sorted(cols) != sorted(ocols):
        fails.append((name, f"cols {sorted(cols)} vs {sorted(ocols)}")); continue
    cs = sorted(cols)
    try:
        ds = digest(spark_src, cs)
        do = digest(oracle[name], cs)
    except Exception as e:
        fails.append((name, f"digest error: {e}")); continue
    if ds != do:
        fails.append((name, f"digest {ds} vs {do}"))
    else:
        print(f"OK   {name} ({ds[0]} rows, digest match)", flush=True)

for name, why in fails:
    print(f"FAIL {name}: {why}", flush=True)
sys.exit(1 if fails else 0)
