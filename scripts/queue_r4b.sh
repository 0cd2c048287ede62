#!/bin/bash
# Round-4 queue, part B: diagnostics studies after the acceptance sweep.
#   1. ST jerk A/B attribution on the sparse/fast-traffic configs
#      (VERDICT r3 item 6) — one sim semantic toggled per run.
#   2. Arbiter-activity parity study (VERDICT r3 item 2) — policy ladder
#      + gate sweep with percent-ST against the reference's column.
# Both write tracked markdown reports, not run_data.csv rows.
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r4b_status.txt
echo $$ > logs/queue_r4b.pid
echo "queue-r4b started $(date) pid=$$" >> "$STATUS"

run_item () {
  local name="$1" tmo="$2"; shift 2
  if grep -q "^DONE $name\$" "$STATUS" 2>/dev/null; then
    echo "skip $name (already done)"; return
  fi
  local t0=$SECONDS
  echo "=== $name start $(date) ===" >> "$STATUS"
  timeout "$tmo" "$@" > "logs/$name.log" 2>&1
  local rc=$?
  local dt=$((SECONDS - t0))
  if [ $rc -eq 0 ]; then
    echo "DONE $name" >> "$STATUS"; echo "=== $name ok ${dt}s ===" >> "$STATUS"
  else
    echo "FAIL $name rc=$rc ${dt}s" >> "$STATUS"
  fi
}

run_item st_jerk_ab_fast 3600 python3 scripts/st_jerk_ab.py --config st_fast --episodes 2000 --out STUDY_ST_JERK.md
run_item arbiter_study_moderate 5400 python3 scripts/arbiter_study.py --family moderate --episodes 2000
run_item st_jerk_ab_moderate 3600 python3 scripts/st_jerk_ab.py --config st_moderate --episodes 2000 --out STUDY_ST_JERK_MODERATE.md

echo "queue-r4b finished $(date)" >> "$STATUS"
