#!/usr/bin/env bash
# Environment bootstrap (role of the reference's bin/make.sh +
# bin/environment.yml, make.sh:1-27): TPU-side deps + optional SUMO build
# for evaluation-grade fidelity runs.
#
# The framework itself needs only the JAX TPU stack — SUMO is OPTIONAL:
# without it, `--backend auto` resolves to the bundled native C++
# microsim (built automatically by g++ on first use) and every CLI,
# test, and benchmark runs unchanged. Install SUMO only for
# reference-parity evaluation over TraCI/libsumo.
set -e

PYTHON=${PYTHON:-python3}

echo "== Python deps (TPU) =="
# jax[tpu] pin is the deployment's choice; everything else is pure-Python.
$PYTHON -m pip install --upgrade \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax chex einops numpy pandas scipy matplotlib msgpack pytest \
    "torch --index-url https://download.pytorch.org/whl/cpu" || {
  echo "pip install failed — in hermetic images the deps are pre-baked; continuing"
}

if [ "${WITH_SUMO:-0}" != "1" ]; then
  echo "== SUMO skipped (set WITH_SUMO=1 to build it) =="
  echo "   The native C++ backend is used automatically when SUMO is absent."
  exit 0
fi

echo "== SUMO build (reference bin/make.sh:24-27) =="
# System deps (Debian/Ubuntu): xerces, fox, gdal, proj, gl2ps.
if command -v apt >/dev/null; then
  sudo apt update && sudo apt install -y \
      build-essential git g++ cmake libxerces-c-dev libfox-1.6-dev \
      libgdal-dev libproj-dev libgl2ps-dev
fi
mkdir -p third_party && cd third_party
[ -d sumo ] || git clone --depth 1 --recursive https://github.com/eclipse/sumo
cmake -S sumo -B sumo/build/cmake-build -DCMAKE_BUILD_TYPE=Release
cmake --build sumo/build/cmake-build -j"$(nproc)"
echo "export SUMO_HOME=$(pwd)/sumo" >> ~/.bashrc
echo "export PATH=\$SUMO_HOME/bin:\$PATH" >> ~/.bashrc
$PYTHON -m pip install traci sumolib libsumo || true
echo "SUMO built. Open a new shell, then run:"
echo "  python -m pytest tests/ -q          # all suites incl. SUMO goldens"
echo "  python evaluate.py -s DQNAgent --backend sumo ...   # parity eval"
