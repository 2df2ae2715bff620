#!/bin/bash
# Post-r4b chip chain: wait for chip queue r4b (NoisyIqn seeds 6-9) ->
# TPU verify legs -> device-protocol snapshot sweeps (the r4a NoisyQr
# seeds, the r4b NoisyIqn seeds, and six round-3 seed dirs that have
# host sweeps) -> host-vs-device protocol rank-agreement report ->
# on-TPU demand-corner probe -> launch chip queue r4c (screen phase).
# Strictly sequential so only one TPU process ever exists (CLAUDE.md).
cd /root/repo
echo $$ > /tmp/chip_post_r4b.pid
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== waiting for r4b $(date)"
until [ -f save/rainbow/ms_probe_iqn/DONE ]; do sleep 60; done
echo "=== r4b done; TPU verify: graft entry $(date)"
timeout 900 python __graft_entry__.py
echo "=== TPU verify: bench $(date)"
timeout 900 python bench.py

# Device sweeps. 50 episodes each, padded batch (S*E tile-aligned since
# the episode-padding fix). || true: one bad dir must not kill the chain.
sweep () {  # sweep <save_dir> <algo> <workdir>
  echo "=== device sweep $1 $(date)"
  timeout 1800 python scripts/eval_snapshots_device.py "$1" \
    -n 50 --algo "$2" --workdir "$3" || true
}
for s in s7 s8 s9 s10; do
  sweep save/rainbow/ms_probe/$s NoisyQrDuelingDQNAgent \
        logs/rainbow/ms_probe/${s}_device
done
for s in s6 s7 s8 s9; do
  sweep save/rainbow/ms_probe_iqn/$s NoisyIqnDuelingDQNAgent \
        logs/rainbow/ms_probe_iqn/${s}_device
done
for s in noisyqr_s4 noisyqr_s5 noisyqr_s6; do
  sweep save/rainbow/$s NoisyQrDuelingDQNAgent logs/rainbow/${s}_device
done
for s in noisyiqn_s3 noisyiqn_s4 noisyiqn_s5; do
  sweep save/rainbow/$s NoisyIqnDuelingDQNAgent logs/rainbow/${s}_device
done

echo "=== protocol rank agreement $(date)"
PAIRS=""
for p in \
  "QrS7:logs/rainbow/ms_probe/s7" "QrS8:logs/rainbow/ms_probe/s8" \
  "QrS9:logs/rainbow/ms_probe/s9" "QrS10:logs/rainbow/ms_probe/s10" \
  "QrS4:logs/rainbow/noisyqr_s4" "QrS5:logs/rainbow/noisyqr_s5" \
  "QrS6:logs/rainbow/noisyqr_s6" "IqnS3:logs/rainbow/noisyiqn_s3" \
  "IqnS4:logs/rainbow/noisyiqn_s4" "IqnS5:logs/rainbow/noisyiqn_s5"; do
  label=${p%%:*}; d=${p#*:}
  hostcsv="$d/sweep_summary.csv"
  devcsv=$(ls "${d}_device/summary.csv" "$d"_device*/summary.csv 2>/dev/null | head -1)
  # r4a/r4b layouts keep the device sweep at <seed>_device inside the
  # parent log dir (sweep() above).
  [ -z "$devcsv" ] && devcsv="${d%/*}/${d##*/}_device/summary.csv"
  [ -f "$hostcsv" ] && [ -f "$devcsv" ] && \
    PAIRS="$PAIRS --label $label --host $hostcsv --device $devcsv"
done
python scripts/compare_eval_protocols.py $PAIRS \
  | tee logs/protocol_agreement_r4.log || true

echo "=== demand-corner probe on TPU $(date)"
timeout 1800 python scripts/probe_device_corner.py -e 64 --main 6000 \
  --pen 0.2 --greens 15,20,25,30 --tpu \
  --packs save/1ramp_1x3/NoisyIqnDuelingDQNAgent_lr5e-05_model.pack \
          save/rainbow/noisyqr_s5/NoisyQrDuelingDQNAgent_lr5e-05_step250k_model.pack \
  | tee logs/device_corner_probe_r4.log || true

echo "=== launching r4c screen $(date)"
nohup bash scripts/run_chipqueue_r4c.sh > logs/chipqueue_r4c_driver.log 2>&1 &
sleep 2
echo "CHIP_POST_R4B DONE $(date)"
