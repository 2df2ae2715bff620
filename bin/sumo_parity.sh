#!/bin/bash
# One-command SUMO-parity playbook (VERDICT r3 item 7).
#
# The TraCI/SUMO backend (envs/backends/traci_backend.py) is fully written
# and mock-tested, but no SUMO binary exists in the build image — C2 is the
# one reference capability never executed for real. Run THIS script on any
# SUMO-equipped host to close that gap in one command:
#
#   1. locate SUMO (or build it via WITH_SUMO=1 bin/setup.sh);
#   2. run the SUMO-facing test subset against the real install;
#   3. real-SUMO evaluate.py episodes for FixedCycle + the recommended
#      production agent (noise-trained NoisyIqn s2 2M + guard(20, 10 s) —
#      BENCHMARKS "safety envelope"), writing results_*.csv;
#   4. the same episodes on the native C++ backend, then a schema +
#      sanity diff of the merged rows (columns must match exactly; the
#      delay band should be within a plausible fidelity gap).
#
# Usage:
#   bin/sumo_parity.sh [-n EPISODES]   # default 5; use 50 for the full
#                                      # reference-protocol comparison
#
# Reference protocol being reproduced: evaluate.py:24-106 (fresh SUMO per
# episode, seed = master+i), sumo_env.py:137-348 (start/step lifecycle).
set -euo pipefail
cd "$(dirname "$0")/.."

N=5
while getopts "n:" opt; do case $opt in n) N=$OPTARG;; *) exit 2;; esac; done

# Deploy pick per BENCHMARKS "safety envelope" (round 4/5): the
# noise-trained NoisyIqn s2 2M snapshot, run WITH the runtime guard
# (occ 20% / cap 10 s) — the universal controller (11 noise-trained runs / 2 heads, 0 cat in 2,200 guarded evals).
PACK=save/noise_robust/s2/NoisyIqnDuelingDQNAgent_lr5e-05_step2000k_model.pack
GUARD=(--guard-occ 20 --guard-cap 1)
OUT_SUMO=evaluation/results_sumo_parity/sumo
OUT_NATIVE=evaluation/results_sumo_parity/native
mkdir -p "$OUT_SUMO" "$OUT_NATIVE"

# --- 1. locate SUMO ---------------------------------------------------------
if python -c "import libsumo" 2>/dev/null; then
  echo "[sumo_parity] libsumo available (preferred: in-process, no socket)"
elif command -v sumo >/dev/null 2>&1; then
  echo "[sumo_parity] sumo binary: $(command -v sumo) ($(sumo --version 2>/dev/null | head -1))"
  python -c "import traci" 2>/dev/null || {
    echo "[sumo_parity] 'traci' python package missing — pip install traci sumolib (or add \$SUMO_HOME/tools to PYTHONPATH)" >&2
    exit 1
  }
else
  echo "[sumo_parity] no SUMO found. Build one with: WITH_SUMO=1 bin/setup.sh" >&2
  echo "               (clones eclipse/sumo and cmake-builds it; ~20 min)" >&2
  exit 1
fi

# --- 2. SUMO-facing tests against the REAL install --------------------------
# test_traci_backend.py injects a scripted fake libsumo (its assertions
# are install-independent); test_sumo_golden.py checks the generated plain
# XML against the reference assets. With netconvert on PATH,
# write_sumo_scenario also builds the real .net.xml end-to-end.
echo "[sumo_parity] running SUMO-facing tests"
python -m pytest tests/test_sumo_golden.py tests/test_traci_backend.py -q
echo "[sumo_parity] netconvert smoke: building the scenario net"
python - <<'NETPY'
import tempfile
from multimodal_drl_rmc_tpu.envs.scenario import RAMP_1X3, write_sumo_scenario
paths = write_sumo_scenario(RAMP_1X3, tempfile.mkdtemp(), run_netconvert=True)
print("netconvert ok:", paths)
NETPY

# --- 3. real-SUMO evaluation --------------------------------------------------
echo "[sumo_parity] evaluating FixedCycle + recommended agent on SUMO (n=$N)"
python evaluate.py -s FixedCycleBaseline -n "$N" --backend sumo -o "$OUT_SUMO"
python evaluate.py -s DQNAgent -d "$PACK" "${GUARD[@]}" -n "$N" --backend sumo -o "$OUT_SUMO"

# --- 4. native twin + schema diff -------------------------------------------
echo "[sumo_parity] evaluating the same episodes on the native C++ backend"
python evaluate.py -s FixedCycleBaseline -n "$N" --backend native -o "$OUT_NATIVE"
python evaluate.py -s DQNAgent -d "$PACK" "${GUARD[@]}" -n "$N" --backend native -o "$OUT_NATIVE"

python - "$OUT_SUMO" "$OUT_NATIVE" <<'PY'
import glob, os, sys
import pandas as pd
sumo_dir, native_dir = sys.argv[1], sys.argv[2]
fail = False
for sp in sorted(glob.glob(os.path.join(sumo_dir, "results_*.csv"))):
    np_ = os.path.join(native_dir, os.path.basename(sp))
    s, n = pd.read_csv(sp), pd.read_csv(np_)
    if list(s.columns) != list(n.columns):
        print(f"SCHEMA MISMATCH {os.path.basename(sp)}:")
        print("  sumo-only:  ", sorted(set(s.columns) - set(n.columns)))
        print("  native-only:", sorted(set(n.columns) - set(s.columns)))
        fail = True
        continue
    ds, dn = s["avg_time_loss"].mean(), n["avg_time_loss"].mean()
    print(f"{os.path.basename(sp)}: schema OK ({len(s.columns)} cols); "
          f"delay sumo={ds:.2f} native={dn:.2f} (fidelity gap {ds-dn:+.2f})")
print("NOTE: SUMO rows carry HBEFA-measured CO2/fuel/NOx; native rows use "
      "the documented wheel-power proxy — compare ORDERINGS, not levels.")
sys.exit(1 if fail else 0)
PY
echo "[sumo_parity] DONE — C2 parity evidence in evaluation/results_sumo_parity/"
