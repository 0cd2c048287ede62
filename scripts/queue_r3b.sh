#!/bin/bash
# Round-3 queue, part B: the reference's second cross family
# (cross_moderate_network_{fast,slow}, saved_data.csv) before the
# remaining combined seeds.  Shares queue_r3's status file so DONE items
# are skipped; run after (or instead of the tail of) queue_r3.sh.
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r3_status.txt
echo $$ > logs/queue_r3b.pid
echo "queue-r3b started $(date) pid=$$" >> "$STATUS"

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

# --- B1: cross_moderate combined rows (seed 1 first, then 2-3) ---
for s in 1 2 3; do
  for tr in fast slow; do
    run_item "cross_moderate_network_${tr}_traffic_${s}"  3000 $PY $MAIN "configs/cross_moderate_network_${tr}_traffic_${s}.json"  --batch 512
    run_item "cross_moderate_network_${tr}_traffic_${s}b" 3000 $PY $MAIN "configs/cross_moderate_network_${tr}_traffic_${s}b.json" --batch 512
  done
done

# --- B2: remaining off-distribution DDPG seeds (2, 3) ---
for s in 2 3; do
  for c in ddpg_medium_network_heavy_traffic ddpg_medium_network_low_traffic \
           ddpg_moderate_network_low_traffic ddpg_moderate_network_fast_traffic; do
    [ -f "configs/${c}_${s}.json" ] && run_item "${c}_${s}" 1500 $PY $MAIN "configs/${c}_${s}.json" --batch 1024
  done
done

# --- B3: remaining combined seeds (2, 3) ---
for s in 2 3; do
  for fam in default low medium moderate fast; do
    run_item "combined_${fam}_${s}"  3000 $PY $MAIN "configs/combined_${fam}_${s}.json"  --batch 512
    run_item "combined_${fam}_${s}b" 3000 $PY $MAIN "configs/combined_${fam}_${s}b.json" --batch 512
  done
done

echo "queue-r3b finished $(date)" >> "$STATUS"
