#!/bin/bash
# Round-2 experiment queue: finish DDPG training, then run the acceptance
# sweeps in value-priority order (VERDICT.md items 1 and 2).  One item at a
# time (one TPU chip); each item appends its row(s) to run_data.csv.
cd /root/repo
mkdir -p logs
STATUS=logs/queue_status.txt
echo "queue started $(date)" >> "$STATUS"

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
    echo "DONE $name" >> "$STATUS"
    echo "=== $name ok ${dt}s ===" >> "$STATUS"
  else
    echo "FAIL $name rc=$rc ${dt}s" >> "$STATUS"
  fi
}

PY="python3"
MAIN="-m rl_mpc_lanemerging_tpu.main"

# --- phase 1: finish moderate1 (extended half + eval) ---
run_item moderate1_finish 2400 $PY scripts/finish_moderate1.py

# --- phase 2: key combined rows that only need existing models ---
run_item combined_default_1  2400 $PY $MAIN configs/combined_default_1.json  --batch 1024
run_item combined_default_1b 2400 $PY $MAIN configs/combined_default_1b.json --batch 1024

# --- phase 3: remaining trainings interleaved with ST sweep ---
run_item train_fast_1     2700 $PY $MAIN configs/train_fast_1.json
run_item st_default_4000  2400 $PY $MAIN configs/st_default.json --batch 1024
run_item train_moderate_2 2700 $PY $MAIN configs/train_moderate_2.json
run_item combined_moderate_1 2400 $PY $MAIN configs/combined_moderate_1.json --batch 1024
run_item combined_low_1      2400 $PY $MAIN configs/combined_low_1.json      --batch 1024
run_item combined_medium_1   2400 $PY $MAIN configs/combined_medium_1.json   --batch 1024
run_item train_fast_2     2700 $PY $MAIN configs/train_fast_2.json
run_item st_low_4000      2400 $PY $MAIN configs/st_low.json    --batch 1024
run_item st_medium_4000   2400 $PY $MAIN configs/st_medium.json --batch 1024
run_item train_moderate_3 2700 $PY $MAIN configs/train_moderate_3.json
run_item combined_fast_1     2400 $PY $MAIN configs/combined_fast_1.json     --batch 1024
run_item combined_fast_1b    2400 $PY $MAIN configs/combined_fast_1b.json    --batch 1024
run_item combined_moderate_1b 2400 $PY $MAIN configs/combined_moderate_1b.json --batch 1024
run_item train_fast_3     2700 $PY $MAIN configs/train_fast_3.json
run_item st_moderate_4000 2400 $PY $MAIN configs/st_moderate.json --batch 1024
run_item st_fast_4000     2400 $PY $MAIN configs/st_fast.json     --batch 1024
run_item combined_low_1b     2400 $PY $MAIN configs/combined_low_1b.json     --batch 1024
run_item combined_medium_1b  2400 $PY $MAIN configs/combined_medium_1b.json  --batch 1024

# --- phase 4: off-distribution DDPG evals (the paper's failure story) ---
for c in ddpg_medium_network_heavy_traffic_1 ddpg_medium_network_low_traffic_1 \
         ddpg_medium_network_moderate_traffic_1 ddpg_medium_network_fast_traffic_1 \
         ddpg_moderate_network_heavy_traffic_1 ddpg_moderate_network_low_traffic_1 \
         ddpg_moderate_network_medium_traffic_1 ddpg_moderate_network_fast_traffic_1; do
  run_item "$c" 1500 $PY $MAIN "configs/$c.json" --batch 1024
done

# --- phase 5: cross combined (seed-1 rows first) ---
for c in cross_medium_network_heavy_traffic_1b cross_medium_network_heavy_traffic_1 \
         cross_medium_network_low_traffic_1b cross_medium_network_low_traffic_1 \
         cross_medium_network_moderate_traffic_1b cross_medium_network_moderate_traffic_1 \
         cross_medium_network_fast_traffic_1b cross_medium_network_fast_traffic_1; do
  run_item "$c" 2400 $PY $MAIN "configs/$c.json" --batch 1024
done

# --- phase 6: remaining seeds (2, 3) of everything above ---
for s in 2 3; do
  for fam in default low medium moderate fast; do
    run_item "combined_${fam}_${s}"  2400 $PY $MAIN "configs/combined_${fam}_${s}.json"  --batch 1024
    run_item "combined_${fam}_${s}b" 2400 $PY $MAIN "configs/combined_${fam}_${s}b.json" --batch 1024
  done
  for net in medium moderate; do
    for tr in heavy low moderate medium fast; do
      f="configs/ddpg_${net}_network_${tr}_traffic_${s}.json"
      [ -f "$f" ] && run_item "ddpg_${net}_network_${tr}_traffic_${s}" 1500 $PY $MAIN "$f" --batch 1024
    done
  done
  for tr in heavy low moderate fast; do
    run_item "cross_medium_network_${tr}_traffic_${s}b" 2400 $PY $MAIN "configs/cross_medium_network_${tr}_traffic_${s}b.json" --batch 1024
    run_item "cross_medium_network_${tr}_traffic_${s}"  2400 $PY $MAIN "configs/cross_medium_network_${tr}_traffic_${s}.json"  --batch 1024
  done
done

echo "queue finished $(date)" >> "$STATUS"
