#!/usr/bin/env python3
"""Scale replay for the spatial_join_auto / spatial_join_geohash oracles
(one oracle text, two catalog entries — they pin two Spark plan shapes
of the same query).

The oracle is a NAIVE cross join `FROM c, p WHERE dist <= 0.15`: at
sf10 that is 1.5M x 2M = 3e12 candidate pairs — DuckDB's replay blew
every timeout in the r11 sweep (>600s, no useful progress). The
replay here applies the same candidate-pruning argument the Spark side
uses: with grid cells of width exactly R = 0.15, any pair within
Euclidean distance R satisfies |dlon| <= R and |dlat| <= R, so the
part's cell index differs from the customer's by at most 1 per axis
(|a-b| <= w implies |floor(a/w) - floor(b/w)| <= 1). Replicating each
part into its 9 neighboring cells turns the cross join into a hash
equi-join on the cell key; the oracle's OWN distance predicate (its
text asserted verbatim below) then decides every surviving pair — the
grid only prunes pairs the predicate would reject anyway, so the
result set is provably identical.

Usage: replay_spatial_sf10.py <verify_dir> <sf_dir> [workdir]
"""
import sys, json, glob, os, time
import duckdb

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
workdir = sys.argv[3] if len(sys.argv) > 3 else ".duckwork"
os.makedirs(f"{workdir}/tmp", exist_ok=True)
oracles = json.load(open(f"{verify_dir}/oracle_sql.json"))

CP_CTES = """WITH c AS (
  SELECT c_custkey,
    (c_custkey % 3600) / 10.0 - 180.0 AS lon,
    (c_custkey % 1700) / 10.0 - 85.0 AS lat
  FROM customer),
p AS (
  SELECT p_partkey,
    (p_partkey % 3600) / 10.0 - 180.0 AS lon,
    (p_partkey % 1700) / 10.0 - 85.0 AS lat
  FROM part)"""
PRED = """sqrt((c.lon - p.lon) * (c.lon - p.lon)
    + (c.lat - p.lat) * (c.lat - p.lat)) <= 0.15"""
DIST = """sqrt((c.lon - p.lon) * (c.lon - p.lon)
    + (c.lat - p.lat) * (c.lat - p.lat)) AS dist"""

BUCKETED = CP_CTES + """,
cc AS (
  SELECT c_custkey, lon, lat,
    CAST(floor(lon / 0.15) AS BIGINT) AS cx,
    CAST(floor(lat / 0.15) AS BIGINT) AS cy
  FROM c),
pn AS (
  SELECT p_partkey, lon, lat,
    CAST(floor(lon / 0.15) AS BIGINT) + dx.d AS cx,
    CAST(floor(lat / 0.15) AS BIGINT) + dy.d AS cy
  FROM p, (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d))
SELECT c.c_custkey, p.p_partkey,
  """ + DIST + """
FROM cc c JOIN pn p USING (cx, cy)
WHERE """ + PRED

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('REPLAY_MEMORY_LIMIT', '90GB')}'")
con.sql(f"SET temp_directory='{workdir}/tmp'")
for pq in glob.glob(f"{sf_dir}/*.parquet"):
    name = pq.split("/")[-1].replace(".parquet", "")
    src = f"{pq}/*.parquet" if os.path.isdir(pq) else pq
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

def digest(rel_sql, cols):
    row = "hash(concat_ws('\x1f', " + ", ".join(
        f'COALESCE(CAST("{c}" AS VARCHAR), \'\x1e\')' for c in cols) + "))"
    q = (f"SELECT count(*) AS n, sum({row}) AS s, min({row}) AS lo, "
         f"max({row}) AS hi FROM ({rel_sql})")
    n, s, lo, hi = con.sql(q).fetchone()
    return (n, None if s is None else int(s) % (1 << 64), lo, hi)

rc = 0
oracle_digest = None
for name in ["spatial_join_auto", "spatial_join_geohash"]:
    oracle = oracles[name]
    assert CP_CTES in oracle and PRED in oracle and DIST in oracle, \
        (f"{name} oracle no longer matches the cross-join form this "
         f"bucketed replay substitutes — re-verify the equivalence")
    t0 = time.time()
    if oracle_digest is None:  # identical oracle text for both entries
        oracle_digest = digest(BUCKETED, sorted(["c_custkey", "p_partkey",
                                                 "dist"]))
    spark_src = (f"SELECT * FROM "
                 f"read_parquet('{verify_dir}/{name}/*.parquet')")
    cols = sorted(r[0] for r in con.sql(
        f"DESCRIBE ({spark_src})").fetchall())
    assert cols == ["c_custkey", "dist", "p_partkey"], cols
    ds = digest(spark_src, cols)
    sec = round(time.time() - t0, 1)
    if ds == oracle_digest:
        print(f"OK   {name} ({ds[0]} rows, digest match, grid-bucketed "
              f"cross-join replay, {sec}s)", flush=True)
    else:
        print(f"FAIL {name}: digest {ds} vs {oracle_digest}", flush=True)
        rc = 1
sys.exit(rc)
