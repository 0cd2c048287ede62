#!/bin/bash
# Round-5 queue: close the behavioral-fidelity tail (VERDICT r4 items
# 1, 3, 4, 5, 7).
#
# Phase A retrains the policies whose recorded rows are far off the
# reference's time-to-merge profile, now under the time-aware snapshot
# score (agents/budget.py): the whole low family (t-merge +60-90%),
# fast seed 1 (combined_fast_1 +50%), and medium seed 3 (the
# worse-than-reference ddpg_medium_network_low_traffic_3 crash row).
# Phase B re-records every row that depends on those checkpoints.
# Phase C runs the custom-DQN end-to-end evidence row (VERDICT missing 1).
# Phase D retrains moderate seeds 2-3 (residual nonzero-crash
# cross_moderate rows) and re-records their dependents.
# Phase E retrains Rainbow under the improved selection (VERDICT weak 5).
# Phase F t-merge polish retrains for the remaining families, lowest
# priority — the round may end mid-phase; partially-trained policies are
# only saved at stage end, so existing checkpoints stay intact.
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r5_status.txt
echo $$ > logs/queue_r5.pid
echo "queue-r5 started $(date) pid=$$" >> "$STATUS"

fam_of () { echo "$1" | sed -E 's/_[0-9]+b?$//; s/[0-9]+$//'; }

run_item () {
  local name="$1" tmo="$2"; shift 2
  local fam; fam=$(fam_of "$name")
  if grep -q "^DONE $name\$" "$STATUS" 2>/dev/null; then
    echo "skip $name (already done)"; return
  fi
  local fails; fails=$(grep -c "^FAIL ${fam}" "$STATUS" 2>/dev/null || true)
  if [ "${fails:-0}" -ge 2 ]; then
    echo "SKIP $name (family $fam failed ${fails}x)" >> "$STATUS"; return
  fi
  local t0=$SECONDS
  echo "=== $name start $(date) ===" >> "$STATUS"
  timeout "$tmo" "$@" > "logs/$name.log" 2>&1
  local rc=$?
  local dt=$((SECONDS - t0))
  if [ $rc -eq 0 ]; then
    echo "DONE $name" >> "$STATUS"
    echo "=== $name ok ${dt}s ===" >> "$STATUS"
  else
    echo "FAIL ${fam} $name rc=$rc ${dt}s" >> "$STATUS"
  fi
}

regen () {
  timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
}

PY="python3"
MAIN="-m rl_mpc_lanemerging_tpu.main"

# --- Phase A: priority retrains under the time-aware snapshot score ---
for t in low_2 low_1 low_3 fast_1 medium_3; do
  run_item "r5train_${t}" 3600 $PY $MAIN "configs/train_${t}.json" --frames 1000000
done
regen

# --- Phase B: re-record dependent rows ---
for s in 1 2 3; do
  run_item "r5_ddpg_low${s}_ext" 1500 $PY scripts/eval_ddpg.py low $s
done
run_item r5_ddpg_evaluate_low_2_4000 1500 $PY scripts/eval_ddpg.py low 2 --log-dir ddpg_evaluate_low_2_4000
run_item r5_ddpg_medium3_ext 1500 $PY scripts/eval_ddpg.py medium 3
run_item r5_ddpg_fast1_ext 1500 $PY scripts/eval_ddpg.py fast 1
for c in combined_low_1 combined_low_1b combined_low_2 combined_low_2b \
         combined_low_3 combined_low_3b combined_fast_1 combined_fast_1b \
         combined_medium_3 combined_medium_3b; do
  run_item "r5_$c" 3000 $PY $MAIN "configs/$c.json" --batch 512
done
for c in ddpg_medium_network_low_traffic_3 \
         cross_medium_network_low_traffic_3 cross_medium_network_low_traffic_3b \
         cross_medium_network_heavy_traffic_3b; do
  run_item "r5_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
regen

# --- Phase C: custom-DQN end-to-end evidence row ---
run_item r5_custom_dqn 10800 $PY scripts/train_custom_dqn.py
regen

# --- Phase D: moderate 2-3 retrains + residual-crash cross rows ---
for t in moderate_2 moderate_3; do
  run_item "r5train_${t}" 3600 $PY $MAIN "configs/train_${t}.json" --frames 1000000
done
run_item r5_ddpg_moderate2_ext 1500 $PY scripts/eval_ddpg.py moderate 2
run_item r5_ddpg_moderate3_ext 1500 $PY scripts/eval_ddpg.py moderate 3
for c in cross_moderate_network_fast_traffic_2 cross_moderate_network_fast_traffic_2b \
         cross_moderate_network_fast_traffic_3 cross_moderate_network_fast_traffic_3b \
         cross_moderate_network_slow_traffic_2 cross_moderate_network_slow_traffic_2b \
         cross_moderate_network_slow_traffic_3 cross_moderate_network_slow_traffic_3b \
         combined_moderate_2 combined_moderate_2b combined_moderate_3 combined_moderate_3b; do
  run_item "r5_$c" 3000 $PY $MAIN "configs/$c.json" --batch 512
done
regen

# --- Phase E: Rainbow retrain under improved selection ---
run_item r5train_rainbow 10800 $PY $MAIN configs/train_dqn_default_1.json --frames 1000000
regen

# --- Phase F: t-merge polish, lowest priority ---
for t in default_1 default_2 default_3 medium_1 medium_2 moderate_1 fast_2 fast_3; do
  run_item "r5train_${t}" 3600 $PY $MAIN "configs/train_${t}.json" --frames 1000000
done
for fam in default medium moderate fast; do
  for s in 1 2 3; do
    run_item "r5f_ddpg_${fam}${s}_ext" 1500 $PY scripts/eval_ddpg.py "$fam" "$s"
  done
done
for fam in default medium moderate fast; do
  for s in 1 2 3; do
    for b in "" b; do
      run_item "r5f_combined_${fam}_${s}${b}" 3000 $PY $MAIN "configs/combined_${fam}_${s}${b}.json" --batch 512
    done
  done
done
for c in cross_medium_network_low_traffic_1 cross_medium_network_low_traffic_1b \
         cross_medium_network_low_traffic_2 cross_medium_network_low_traffic_2b \
         cross_medium_network_heavy_traffic_1b cross_medium_network_heavy_traffic_2b \
         cross_moderate_network_fast_traffic_1 cross_moderate_network_fast_traffic_1b \
         cross_moderate_network_slow_traffic_1 cross_moderate_network_slow_traffic_1b \
         ddpg_medium_network_heavy_traffic_1 ddpg_medium_network_heavy_traffic_2 \
         ddpg_medium_network_heavy_traffic_3 ddpg_medium_network_low_traffic_1 \
         ddpg_medium_network_low_traffic_2; do
  run_item "r5f_$c" 1500 $PY $MAIN "configs/$c.json" --batch 512
done
regen

echo "queue-r5 finished $(date)" >> "$STATUS"
