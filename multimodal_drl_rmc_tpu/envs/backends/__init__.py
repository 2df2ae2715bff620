"""Pluggable traffic-simulation backends.

* native  — in-process C++ microsim (native.py; fastest host backend)
* sumo    — SUMO over libsumo/TraCI (traci_backend.py; evaluation fidelity,
            requires a SUMO installation)
* fake    — scripted macroscopic model (../fake_backend.py; tests)
* device  — the on-device JAX simulator bypasses this layer (sim/)
"""
