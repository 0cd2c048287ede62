#!/bin/bash
# Round-4 queue: close the acceptance matrix (VERDICT r3 item 1).
#
# Phase A retrains every policy the missing rows depend on UNDER THE
# CURRENT sim semantics with the improved trainer (best-eval snapshot
# selection, 1e6 frames/stage like the reference's ddpg.py:96-102
# pipeline): seeds 2-3 of all five traffic families, the entire fast
# family, and honesty retrains of default_1/low_1 (their recorded rows
# predated the r3 semantics fixes).  Each TRAIN_DDPG task ends with the
# 4000-episode in-distribution eval row.
# Phase B converges Rainbow (VERDICT item 3) at the reference's budget.
# Phase C records the cheap EVALUATE_DDPG rows (fast/moderate extended,
# the oddball ddpg_evaluate_low_2_4000, the ddpg_* cross-traffic rows
# incl. the newly generated moderate_network_slow configs).
# Phase D/E record the combined seeds 2-3 and the missing cross rows.
# Phase F re-records the seed-1 combined/cross rows so every recorded row
# is reproducible from the checkpoints now in runs/.
# ACCEPTANCE.md is regenerated after every phase (VERDICT item 5).
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r4_status.txt
echo $$ > logs/queue_r4.pid
echo "queue-r4 started $(date) pid=$$" >> "$STATUS"

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

regen () {  # keep ACCEPTANCE.md in lockstep with run_data.csv
  timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1
}

PY="python3"
MAIN="-m rl_mpc_lanemerging_tpu.main"

# --- Phase A: policy retrains (current semantics, best-snapshot) ---
for t in default_2 low_2 fast_1 fast_2 fast_3 default_3 low_3 medium_3 \
         moderate_2 moderate_3 default_1 low_1; do
  run_item "train_${t}" 3600 $PY $MAIN "configs/train_${t}.json" --frames 1000000
done
regen

# --- Phase B: Rainbow at the reference budget (VERDICT item 3) ---
run_item train_dqn_default_1 7200 $PY $MAIN configs/train_dqn_default_1.json --frames 1000000
regen

# --- Phase C: EVALUATE_DDPG rows ---
for s in 1 2 3; do
  run_item "ddpg_fast${s}_extended_eval" 1500 $PY scripts/eval_ddpg.py fast $s
done
run_item ddpg_moderate3_extended_eval 1500 $PY scripts/eval_ddpg.py moderate 3
run_item ddpg_evaluate_low_2_4000 1500 $PY scripts/eval_ddpg.py low 2 --log-dir ddpg_evaluate_low_2_4000
for c in ddpg_medium_network_heavy_traffic_2 ddpg_medium_network_heavy_traffic_3 \
         ddpg_medium_network_low_traffic_2 ddpg_medium_network_low_traffic_3 \
         ddpg_moderate_network_fast_traffic_2 ddpg_moderate_network_fast_traffic_3 \
         ddpg_moderate_network_slow_traffic_1 ddpg_moderate_network_slow_traffic_2 \
         ddpg_moderate_network_slow_traffic_3; do
  run_item "$c" 1500 $PY $MAIN "configs/$c.json" --batch 1024
done
regen

# --- Phase D: combined seeds 2-3 (20 rows) ---
for s in 2 3; do
  for fam in default low medium moderate fast; do
    run_item "combined_${fam}_${s}"  3000 $PY $MAIN "configs/combined_${fam}_${s}.json"  --batch 512
    run_item "combined_${fam}_${s}b" 3000 $PY $MAIN "configs/combined_${fam}_${s}b.json" --batch 512
  done
done
regen

# --- Phase E: missing cross rows ---
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

# --- Phase F: re-record seed-1 rows on the retrained checkpoints so the
# recorded rows are reproducible from the repo's current params ---
for fam in default low medium moderate fast; do
  run_item "combined_${fam}_1_redo"  3000 $PY $MAIN "configs/combined_${fam}_1.json"  --batch 512
  run_item "combined_${fam}_1b_redo" 3000 $PY $MAIN "configs/combined_${fam}_1b.json" --batch 512
done
for c in cross_medium_network_heavy_traffic_1 cross_medium_network_heavy_traffic_1b \
         cross_medium_network_low_traffic_1 cross_medium_network_low_traffic_1b \
         cross_medium_network_moderate_traffic_1 cross_medium_network_moderate_traffic_1b \
         cross_medium_network_fast_traffic_1 cross_medium_network_fast_traffic_1b \
         cross_moderate_network_fast_traffic_1 cross_moderate_network_fast_traffic_1b \
         cross_moderate_network_slow_traffic_1 cross_moderate_network_slow_traffic_1b \
         ddpg_medium_network_heavy_traffic_1 ddpg_medium_network_low_traffic_1 \
         ddpg_medium_network_moderate_traffic_1 ddpg_medium_network_fast_traffic_1 \
         ddpg_moderate_network_heavy_traffic_1 ddpg_moderate_network_low_traffic_1 \
         ddpg_moderate_network_medium_traffic_1 ddpg_moderate_network_fast_traffic_1; do
  run_item "${c}_redo" 3000 $PY $MAIN "configs/$c.json" --batch 512
done
regen

echo "queue-r4 finished $(date)" >> "$STATUS"
