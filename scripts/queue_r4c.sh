#!/bin/bash
# Round-4 queue, part C — post scatter-fix, strict priority order:
#   1. combined seeds 2-3 (the 20 missing acceptance rows)
#   2. missing cross rows (14)
#   3. re-records of every row recorded at batch 1024 BEFORE the spawner
#      scatter fix (the TPU backend dropped spawn writes at that batch,
#      inflating fast/moderate-traffic crash rates 10-45x)
#   4. diagnostics studies (VERDICT items 2 and 6)
#   5. extended-row refreshes + custom-DQN evidence row (time permitting)
# ACCEPTANCE.md regenerates after each phase.
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r4c_status.txt
echo $$ > logs/queue_r4c.pid
echo "queue-r4c started $(date) pid=$$" >> "$STATUS"

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

regen () { timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1; }

PY="python3"
MAIN="-m rl_mpc_lanemerging_tpu.main"

# --- 1: combined seeds 2-3 ---
for s in 2 3; do
  for fam in default low medium moderate fast; do
    run_item "combined_${fam}_${s}"  3000 $PY $MAIN "configs/combined_${fam}_${s}.json"  --batch 512
    run_item "combined_${fam}_${s}b" 3000 $PY $MAIN "configs/combined_${fam}_${s}b.json" --batch 512
  done
done
regen

# --- 2: missing cross rows ---
for c in cross_medium_network_low_traffic_2 cross_medium_network_low_traffic_2b \
         cross_medium_network_low_traffic_3 cross_medium_network_low_traffic_3b \
         cross_medium_network_heavy_traffic_2b cross_medium_network_heavy_traffic_3b \
         cross_moderate_network_fast_traffic_2 cross_moderate_network_fast_traffic_2b \
         cross_moderate_network_fast_traffic_3 cross_moderate_network_fast_traffic_3b \
         cross_moderate_network_slow_traffic_2 cross_moderate_network_slow_traffic_2b \
         cross_moderate_network_slow_traffic_3 cross_moderate_network_slow_traffic_3b; do
  run_item "$c" 3000 $PY $MAIN "configs/$c.json" --batch 512
done
regen

# --- 3: re-record the pre-fix batch-1024 rows ---
for s in 1 2 3; do
  run_item "ddpg_fast${s}_extended_fix" 2400 $PY scripts/eval_ddpg.py fast $s
done
run_item ddpg_moderate3_extended_fix 2400 $PY scripts/eval_ddpg.py moderate 3
run_item ddpg_evaluate_low_2_4000_fix 2400 $PY scripts/eval_ddpg.py low 2 --log-dir ddpg_evaluate_low_2_4000
for c in ddpg_medium_network_heavy_traffic_2 ddpg_medium_network_heavy_traffic_3 \
         ddpg_medium_network_low_traffic_2 ddpg_medium_network_low_traffic_3 \
         ddpg_moderate_network_fast_traffic_2 ddpg_moderate_network_fast_traffic_3 \
         ddpg_moderate_network_slow_traffic_1 ddpg_moderate_network_slow_traffic_2 \
         ddpg_moderate_network_slow_traffic_3; do
  run_item "${c}_fix" 2400 $PY $MAIN "configs/$c.json" --batch 1024
done
regen

# --- 4: diagnostics studies ---
run_item st_jerk_ab_fast 5400 $PY scripts/st_jerk_ab.py --config st_fast --episodes 1024 --out STUDY_ST_JERK.md
run_item arbiter_study_moderate 7200 $PY scripts/arbiter_study.py --family moderate --episodes 1024
run_item st_jerk_ab_moderate 5400 $PY scripts/st_jerk_ab.py --config st_moderate --episodes 1024 --out STUDY_ST_JERK_MODERATE.md

# --- 5: refreshes + custom DQN (time permitting) ---
for fam in default low medium moderate; do
  for s in 1 2 3; do
    [ -d "runs/ddpg_${fam}${s}_extended/params" ] && \
      run_item "ddpg_${fam}${s}_extended_refresh" 1500 $PY scripts/eval_ddpg.py "$fam" "$s"
  done
done
regen
run_item dqn_custom_default1 5400 $PY scripts/train_custom_dqn.py
regen

echo "queue-r4c finished $(date)" >> "$STATUS"
