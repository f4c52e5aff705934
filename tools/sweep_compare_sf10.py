#!/usr/bin/env python3
"""DuckDB-side driver for the full-catalog sf10 oracle sweep (round 11).

For every oracle-able query with a completed Spark dump (_SUCCESS
marker), runs compare_digest.py in a SUBPROCESS with a timeout and an
explicit DuckDB memory limit — one runaway oracle must cost its own
entry, never the sweep. The graph family (triangle_count/kcore/pagerank)
is excluded here; tools/replay_graph_sf10.py owns those (shared edge
CTE, pinned join order, sharded kcore peel). Results accumulate in a
resumable ledger; queries the Spark side refused (ExactAnchorGuard) are
recorded as designed infeasibilities with the refusal message pulled
from the dump logs.

Usage: sweep_compare_sf10.py <verify_dir> <sf_dir> <ledger.json>
         [--timeout SEC] [--mem LIMIT] [--only q1,q2] [--redo]
"""
import sys, json, glob, os, time, subprocess, argparse

GRAPH = {"triangle_count", "kcore", "pagerank"}

ap = argparse.ArgumentParser()
ap.add_argument("verify_dir"); ap.add_argument("sf_dir"); ap.add_argument("ledger")
ap.add_argument("--timeout", type=int, default=900)
ap.add_argument("--mem", default="40GB")
ap.add_argument("--only", default=None)
ap.add_argument("--redo", action="store_true",
                help="re-run queries already in the ledger")
ap.add_argument("--logs", default="/tmp/sf10_logs",
                help="sweep_dump stderr dir (for refusal messages)")
a = ap.parse_args()

oracle = json.load(open(f"{a.verify_dir}/oracle_sql.json"))
ledger = json.load(open(a.ledger)) if os.path.exists(a.ledger) else {}
only = set(a.only.split(",")) if a.only else None

# Spark-side refusals, harvested once from the dump logs
refusals = {}
for f in glob.glob(f"{a.logs}/batch_*.err"):
    for line in open(f, errors="replace"):
        if "] " in line and " failed: " in line and "[verify]" in line:
            name = line.split("[verify] ")[1].split(" failed: ")[0]
            refusals[name] = line.split(" failed: ", 1)[1].strip()[:300]

env = dict(os.environ, DIGEST_MEMORY_LIMIT=a.mem,
           DIGEST_TEMP_DIR=os.path.abspath(".duckwork/tmp"))

def record(name, entry):
    entry["at"] = int(time.time())
    ledger[name] = entry
    json.dump(ledger, open(a.ledger, "w"), indent=1, sort_keys=True)

for name in sorted(oracle):
    if only and name not in only: continue
    if name in GRAPH: continue
    if not a.redo and name in ledger: continue
    done = os.path.exists(f"{a.verify_dir}/{name}/_SUCCESS")
    if not done:
        if name in refusals:
            record(name, {"status": "infeasible_spark",
                          "note": refusals[name]})
            print(f"SKIP {name}: spark-side designed refusal", flush=True)
        else:
            print(f"WAIT {name}: no dump yet", flush=True)
        continue
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "tools/compare_digest.py",
             a.verify_dir, a.sf_dir, name],
            capture_output=True, text=True, timeout=a.timeout, env=env)
        out = (p.stdout + p.stderr).strip()
        sec = round(time.time() - t0, 1)
        # parse the row count from the matched OK line itself, not a
        # positional split of combined stdout+stderr (an earlier '(' from
        # a DuckDB/Python warning would break the split)
        import re
        m = re.search(rf"^OK\s+{re.escape(name)} \((\d+) rows", out, re.M)
        if p.returncode == 0 and m:
            rows = int(m.group(1))
            record(name, {"status": "exact", "rows": rows, "sec": sec})
            print(f"OK   {name} ({rows} rows, {sec}s)", flush=True)
        else:
            record(name, {"status": "fail", "sec": sec,
                          "note": out[-400:]})
            print(f"FAIL {name}: {out[-200:]}", flush=True)
    except subprocess.TimeoutExpired:
        record(name, {"status": "infeasible_duckdb",
                      "note": f"replay exceeded {a.timeout}s"})
        print(f"TIME {name}: > {a.timeout}s", flush=True)
    except Exception as e:
        # one noisy query must cost its own ledger entry, never the sweep
        record(name, {"status": "fail",
                      "note": f"sweep-side exception: {e!r}"[:400]})
        print(f"ERR  {name}: {e!r}", flush=True)
    finally:
        # a killed DuckDB leaves its spill files behind (the documented
        # .tmp gotcha) — reclaim them before the next query
        import shutil
        shutil.rmtree(env["DIGEST_TEMP_DIR"], ignore_errors=True)

n = {"exact": 0, "fail": 0, "infeasible_spark": 0, "infeasible_duckdb": 0}
for v in ledger.values():
    n[v["status"]] = n.get(v["status"], 0) + 1
print(f"[ledger] {a.ledger}: {n} of {len(oracle) - len(GRAPH)} non-graph oracle queries",
      flush=True)
