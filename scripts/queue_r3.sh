#!/bin/bash
# Round-3 acceptance queue — after the Pallas-routed combined arbiter and
# the lateral-overlap collision fix.  Every eval row is (re-)recorded under
# the fixed semantics.  Fails fast per family: after 2 FAILs with the same
# family prefix, remaining items of that family are skipped (advisor
# finding: don't burn the timeout budget on a known-broken family).
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r3_status.txt
echo $$ > logs/queue_r3.pid
echo "queue-r3 started $(date) pid=$$" >> "$STATUS"

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

PY="python3"
MAIN="-m rl_mpc_lanemerging_tpu.main"

# --- phase 1: flagship rows (zero-crash ST + the paper's combined rows) ---
run_item st_default          2400 $PY $MAIN configs/st_default.json --batch 1024
run_item combined_default_1  3000 $PY $MAIN configs/combined_default_1.json  --batch 512
run_item combined_default_1b 3000 $PY $MAIN configs/combined_default_1b.json --batch 512

# --- phase 2: ST sweep ---
run_item st_low      2400 $PY $MAIN configs/st_low.json      --batch 1024
run_item st_medium   2400 $PY $MAIN configs/st_medium.json   --batch 1024
run_item st_moderate 2400 $PY $MAIN configs/st_moderate.json --batch 1024
run_item st_fast     2400 $PY $MAIN configs/st_fast.json     --batch 1024

# --- phase 3: re-record in-distribution DDPG rows under fixed collisions ---
for fam in default low medium moderate; do
  for s in 1 2 3; do
    [ -d "runs/ddpg_${fam}${s}_extended/params" ] && \
      run_item "ddpg_${fam}${s}_extended" 1800 $PY scripts/eval_ddpg.py "$fam" "$s"
  done
done
run_item "ddpg_fast1_extended" 1800 $PY scripts/eval_ddpg.py fast 1

# --- phase 4: combined sweep, seed-1 rows ---
for fam in moderate low medium fast; do
  run_item "combined_${fam}_1"  3000 $PY $MAIN "configs/combined_${fam}_1.json"  --batch 512
  run_item "combined_${fam}_1b" 3000 $PY $MAIN "configs/combined_${fam}_1b.json" --batch 512
done

# --- phase 4b: Rainbow end-to-end (TRAIN_DQN pipeline, reference
# rainbow.py:85-106: train -> lr/10 extended -> evaluate) ---
run_item train_dqn_default_1 10000 $PY $MAIN configs/train_dqn_default_1.json

# --- phase 5: off-distribution DDPG evals (paper's motivation story) ---
for c in ddpg_medium_network_heavy_traffic_1 ddpg_medium_network_low_traffic_1 \
         ddpg_medium_network_moderate_traffic_1 ddpg_medium_network_fast_traffic_1 \
         ddpg_moderate_network_heavy_traffic_1 ddpg_moderate_network_low_traffic_1 \
         ddpg_moderate_network_medium_traffic_1 ddpg_moderate_network_fast_traffic_1; do
  [ -f "configs/$c.json" ] && run_item "$c" 1500 $PY $MAIN "configs/$c.json" --batch 1024
done

# --- phase 6: cross combined rows (seed 1) ---
for tr in heavy low moderate fast; do
  run_item "cross_medium_network_${tr}_traffic_1"  3000 $PY $MAIN "configs/cross_medium_network_${tr}_traffic_1.json"  --batch 512
  run_item "cross_medium_network_${tr}_traffic_1b" 3000 $PY $MAIN "configs/cross_medium_network_${tr}_traffic_1b.json" --batch 512
done

# --- phase 7: remaining trainings + their rows ---
run_item train_moderate_3 7200 $PY $MAIN configs/train_moderate_3.json
run_item train_fast_2     7200 $PY $MAIN configs/train_fast_2.json
run_item train_fast_3     7200 $PY $MAIN configs/train_fast_3.json

# --- phase 8: remaining combined seeds (2, 3) ---
for s in 2 3; do
  for fam in default low medium moderate fast; do
    run_item "combined_${fam}_${s}"  3000 $PY $MAIN "configs/combined_${fam}_${s}.json"  --batch 512
    run_item "combined_${fam}_${s}b" 3000 $PY $MAIN "configs/combined_${fam}_${s}b.json" --batch 512
  done
done

echo "queue-r3 finished $(date)" >> "$STATUS"
