#!/bin/bash
# Round-5 follow-up queue (run after queue_r5.sh): re-train medium seed 3
# under the 0.002/s time weight (the 0.001/s phase-A run left its ~5 s
# t-merge gap unselected-for) and refresh its dependent rows.
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r5b_status.txt
echo $$ > logs/queue_r5b.pid
echo "queue-r5b started $(date) pid=$$" >> "$STATUS"
run_item () {
  local name="$1" tmo="$2"; shift 2
  if grep -q "^DONE $name\$" "$STATUS" 2>/dev/null; then
    echo "skip $name"; return
  fi
  echo "=== $name start $(date) ===" >> "$STATUS"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "logs/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then echo "DONE $name" >> "$STATUS"; else echo "FAIL $name rc=$rc" >> "$STATUS"; fi
  echo "=== $name end $((SECONDS-t0))s ===" >> "$STATUS"
}
PY="python3"; MAIN="-m rl_mpc_lanemerging_tpu.main"
run_item r5b_train_medium_3 3600 $PY $MAIN configs/train_medium_3.json --frames 1000000
run_item r5b_ddpg_medium3_ext 1500 $PY scripts/eval_ddpg.py medium 3
run_item r5b_ddpg_medium_network_low_traffic_3 1500 $PY $MAIN configs/ddpg_medium_network_low_traffic_3.json --batch 512
run_item r5b_combined_medium_3 3000 $PY $MAIN configs/combined_medium_3.json --batch 512
run_item r5b_combined_medium_3b 3000 $PY $MAIN configs/combined_medium_3b.json --batch 512
for c in cross_medium_network_low_traffic_3 cross_medium_network_low_traffic_3b cross_medium_network_heavy_traffic_3b; do
  run_item "r5b_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
echo "queue-r5b finished $(date)" >> "$STATUS"
