#!/bin/bash
# Round-5 queue C (after r5b): re-train the seeds whose phase-F
# 512-episode selection evals picked false-zero-crash snapshots
# (combined_medium_1 0.0044, cross_moderate_fast_1 0.0056, ...), now
# under 2048-episode selection evals, and refresh the damaged rows first
# (currently-fine dependent rows re-record afterwards for
# reproducibility).
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r5c_status.txt
echo $$ > logs/queue_r5c.pid
echo "queue-r5c started $(date) pid=$$" >> "$STATUS"
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

run_item r5c_train_medium_1 3600 $PY $MAIN configs/train_medium_1.json --frames 1000000
run_item r5c_train_moderate_1 3600 $PY $MAIN configs/train_moderate_1.json --frames 1000000
# damaged rows first
for c in combined_medium_1 combined_medium_1b \
         cross_medium_network_heavy_traffic_1b cross_medium_network_low_traffic_1b \
         cross_moderate_network_fast_traffic_1 cross_moderate_network_fast_traffic_1b \
         cross_moderate_network_slow_traffic_1; do
  run_item "r5c_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
# consistency re-records of the remaining dependents of the two policies
run_item r5c_ddpg_medium1_ext 1500 $PY scripts/eval_ddpg.py medium 1
run_item r5c_ddpg_moderate1_ext 1500 $PY scripts/eval_ddpg.py moderate 1
for c in combined_moderate_1 combined_moderate_1b \
         cross_medium_network_heavy_traffic_1 cross_medium_network_low_traffic_1 \
         cross_medium_network_moderate_traffic_1 cross_medium_network_moderate_traffic_1b \
         cross_medium_network_fast_traffic_1 cross_medium_network_fast_traffic_1b \
         cross_moderate_network_slow_traffic_1b; do
  run_item "r5c_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
# medium_3 re-roll: the r5b 512-eval selection picked a false-zero
# (recorded crash 0.0051); its combined/cross dependents need the
# 2048-eval selection too
run_item r5c_train_medium_3 3600 $PY $MAIN configs/train_medium_3.json --frames 1000000
for c in combined_medium_3 combined_medium_3b \
         ddpg_medium_network_low_traffic_3 \
         cross_medium_network_low_traffic_3 cross_medium_network_low_traffic_3b \
         cross_medium_network_heavy_traffic_3b; do
  run_item "r5c_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
run_item r5c_ddpg_medium3_ext 1500 $PY scripts/eval_ddpg.py medium 3
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
# optional polish if time remains: medium_2 (0.0012) re-roll
run_item r5c_train_medium_2 3600 $PY $MAIN configs/train_medium_2.json --frames 1000000
for c in combined_medium_2 combined_medium_2b; do
  run_item "r5c_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
echo "queue-r5c finished $(date)" >> "$STATUS"
