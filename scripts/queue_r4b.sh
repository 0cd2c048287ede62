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

run_item st_jerk_ab_fast 5400 python3 scripts/st_jerk_ab.py --config st_fast --episodes 1024 --out STUDY_ST_JERK.md
run_item arbiter_study_moderate 7200 python3 scripts/arbiter_study.py --family moderate --episodes 1024
run_item st_jerk_ab_moderate 5400 python3 scripts/st_jerk_ab.py --config st_moderate --episodes 1024 --out STUDY_ST_JERK_MODERATE.md

# fresh ddpg_*_extended eval rows: the tracked rows for these LOG_DIRs
# predate the r4 retrains (legacy checkpoints under the r3 semantics,
# crash ~0.29); re-record them from the retrained checkpoints so the
# latest row per LOG_DIR reflects reproducible in-repo state.
for fam in default low medium moderate; do
  for s in 1 2 3; do
    [ -d "runs/ddpg_${fam}${s}_extended/params" ] && \
      run_item "ddpg_${fam}${s}_extended_refresh" 1500 python3 scripts/eval_ddpg.py "$fam" "$s"
  done
done
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1


# --- phase F (moved from queue_r4): re-record seed-1 combined/cross rows
# on the retrained checkpoints so every recorded row is reproducible from
# the params now in runs/ ---
MAIN="-m rl_mpc_lanemerging_tpu.main"
for fam in default low medium moderate fast; do
  run_item "combined_${fam}_1_redo"  3000 python3 $MAIN "configs/combined_${fam}_1.json"  --batch 512
  run_item "combined_${fam}_1b_redo" 3000 python3 $MAIN "configs/combined_${fam}_1b.json" --batch 512
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
  run_item "${c}_redo" 3000 python3 $MAIN "configs/$c.json" --batch 512
done
timeout 300 python3 scripts/compare_baseline.py >> "$STATUS" 2>&1

# custom Double-DQN/PER trainer evidence row (VERDICT r3 weak 7)
run_item dqn_custom_default1 5400 python3 scripts/train_custom_dqn.py

echo "queue-r4b finished $(date)" >> "$STATUS"
