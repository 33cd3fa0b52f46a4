#!/bin/bash
# VERDICT r9 item 2: full-surface oracle at the bench SF (sf0.1).
# Dumps every declared query at sf0.1 and runs the DuckDB differential
# check, then writes a CORRECTNESS-style summary JSON.
set -u
OUT=${1:-/tmp/vout_sf01}
LOG=${2:-/tmp/check_sf01.log}
rm -rf "$OUT"
/tmp/run_graft.sh graft.Verify /root/testdata/sf0.1 "$OUT" > /tmp/verify_sf01.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 "$OUT" > "$LOG" 2>&1
echo "CHECK_EXIT=$?" >> "$LOG"
python3 - "$LOG" <<'EOF'
import json, re, sys
txt = open(sys.argv[1]).read()
passes = re.findall(r'^PASS (\S+)', txt, re.M)
fails = re.findall(r'^FAIL (\S+): (.*)$', txt, re.M)
json.dump({"sf": "sf0.1", "pass": len(passes),
           "fail": [{ "q": q.rstrip(':'), "why": w} for q, w in fails]},
          open("CORRECTNESS_SF01_FULL.json", "w"), indent=1)
print("pass", len(passes), "fail", len(fails))
EOF
