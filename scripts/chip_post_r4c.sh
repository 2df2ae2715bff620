#!/bin/bash
# Post-r4c-screen chip chain: wait for the r4c screen phase -> device
# stability map (the calibration chart for the protocol divergence) ->
# N=1000 classical tail certs (device-protocol tables get their
# classical bars) -> host screen sweeps of ms_screen s11-14 on CPU ->
# apply the early-decidability gate -> launch the continuation for
# screen-positive seeds (the COMMIT phase). Strictly sequential on the
# chip (CLAUDE.md one-TPU-process invariant).
cd /root/repo
echo $$ > /tmp/chip_post_r4c.pid
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== waiting for r4c screen phase $(date)"
until grep -q "CHIPQUEUE R4C SCREEN DONE" logs/chipqueue_r4c_driver.log 2>/dev/null; do
  sleep 60
done

echo "=== device stability map $(date)"
timeout 3600 python scripts/stability_map.py --backend device --tpu -e 16 \
  | tee logs/stability_map_device.log || true

echo "=== classical tail certs n=1000 $(date)"
timeout 5400 python scripts/tail_cert_device.py -n 1000 --master-seed 1042 \
  --out evaluation/results_tailcert \
  AlwaysGreenBaseline FixedCycleBaseline AlineaDsBaseline \
  PiAlineaDsBaseline | tee logs/tailcert_classical.log || true

echo "=== host screen sweeps of ms_screen s11-14 (CPU) $(date)"
POS=""
for s in 11 12 13 14; do
  d=save/rainbow/ms_screen/s$s
  logd=logs/rainbow/ms_screen/s$s
  mkdir -p "$logd"
  if [ ! -f "$logd/sweep_summary.csv" ]; then
    JAX_PLATFORMS='' PYTHONPATH='' timeout 3600 \
      python scripts/eval_snapshots.py "$d" -n 20 \
        --algo NoisyQrDuelingDQNAgent \
        --workdir "/tmp/screen_sweep_s$s" > "$logd/sweep.log" 2>&1
    cp "/tmp/screen_sweep_s$s/summary.csv" "$logd/sweep_summary.csv"
  fi
  verdict=$(JAX_PLATFORMS='' PYTHONPATH='' python - <<PY
import csv
best = min((float(r["delay"]) for r in
            csv.DictReader(open("$logd/sweep_summary.csv"))
            if float(r["steps"]) <= 500_000), default=99.0)
print("POS" if best < 30.0 else "NEG", round(best, 2))
PY
)
  echo "seed $s screen: $verdict"
  case "$verdict" in POS*) POS="$POS$s," ;; esac
done
POS=${POS%,}
echo "screen-positive seeds: [${POS:-none}]" | tee logs/r4c_screen_verdict.txt

if [ -n "$POS" ]; then
  echo "=== launching continuation for seeds $POS $(date)"
  nohup bash scripts/run_chipqueue_r4c_continue.sh "$POS" \
    > logs/chipqueue_r4c_continue_driver.log 2>&1 &
  sleep 2
else
  echo "=== no screen-positive seeds: stack abandoned at 525k (the"
  echo "    pipeline's cost-saving branch — 75% of the budget unspent)"
fi
echo "CHIP_POST_R4C DONE $(date)"
