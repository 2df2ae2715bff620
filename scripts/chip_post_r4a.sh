#!/bin/bash
# Post-r4a chip chain: TPU verify legs -> device sweeps of the 4 fresh
# NoisyQr seeds -> N=1000 tail certification of the deployment
# candidates -> launch chip queue r4b. Strictly sequential so only one
# TPU process ever exists (CLAUDE.md invariant).
cd /root/repo
echo $$ > /tmp/chip_post_r4a.pid
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== TPU verify: graft entry $(date)"
timeout 900 python __graft_entry__.py
echo "=== TPU verify: bench $(date)"
timeout 900 python bench.py
for s in s7 s8 s9 s10; do
  echo "=== device sweep $s $(date)"
  timeout 1800 python scripts/eval_snapshots_device.py save/rainbow/ms_probe/$s \
    -n 50 --algo NoisyQrDuelingDQNAgent --workdir logs/rainbow/ms_probe/${s}_device
done
echo "=== tail cert $(date)"
timeout 5400 python scripts/tail_cert_device.py -n 1000 --master-seed 1042 \
  --out evaluation/results_tailcert \
  save/1ramp_1x3/NoisyIqnDuelingDQNAgent_lr5e-05_model.pack \
  save/rainbow/noisyiqn_s4/NoisyIqnDuelingDQNAgent_lr5e-05_step375k_model.pack \
  save/rainbow/noisyqr_s5/NoisyQrDuelingDQNAgent_lr5e-05_step250k_model.pack \
  save/rainbow/noisyqr_s6/NoisyQrDuelingDQNAgent_lr5e-05_step250k_model.pack \
  save/1ramp_1x3/PerDuelingDoubleDQNAgent_lr0.0001_model.pack
echo "=== launching r4b $(date)"
nohup bash scripts/run_chipqueue_r4b.sh > logs/chipqueue_r4b_driver.log 2>&1 &
sleep 2
echo "CHIP_POST_R4A DONE $(date)"
