"""Pallas TPU kernels for the hot paths.

* sim_step.fused_substeps — the traffic-physics substeps (IDM + stop line
  + zipper merge) as one kernel; ~5x over the scanned XLA ops on v5e.
* dueling.dueling_greedy_actions — advantage matmul + masked argmax fused
  for greedy action selection.
Both have bit-equivalent XLA fallbacks (sim/core.py, models/networks.py)
selected automatically on CPU.
"""

from .dueling import dueling_greedy_actions, greedy_fn_pallas
from .sim_step import fused_substeps

__all__ = ["dueling_greedy_actions", "greedy_fn_pallas", "fused_substeps"]
