"""Fused traffic-physics substeps as one Pallas TPU kernel.

Why: the scanned XLA implementation of ``sim.core._substep`` emits ~60
small HLOs per substep on [B, 5, 256] arrays; on the axon v5e each op
carries fixed overhead that dominates at these tiny shapes (measured
~7 ms/substep at B=256 after algorithmic fixes). This kernel executes BOTH
substeps of a 1 s sim step — same-lane IDM following, the red-phase stop
line, and the zipper-merge cross-stream coupling — as a single pallas_call
with every intermediate in VMEM.

Parity: bit-equivalent math to ``sim.core._substep`` (same IDM constants,
same binned suffix-min coupling); tests/test_pallas.py asserts allclose
against the XLA path.

Layout notes:
  * grid over env tiles of ``BT`` envs; all arrays [BT, C, N] f32
    (bool masks travel as f32 0/1 — Mosaic-friendly);
  * the per-bin reduction and the bin lookup both reuse the same one-hot
    [BT, N, BINS] tensor (sum == single occupant, <=1 vehicle per 4 m bin);
  * the suffix min runs as log2(BINS) shift-mask-select rounds;
  * no argmax/gather/scatter anywhere — everything is compare/select/
    reduce, the VPU-native subset.

Env-block (BT) ceiling — measured on v5e (scripts/diag_block16.py):
BT=8 fits the default 16 MiB scoped-VMEM budget (~14.3 MiB working set);
BT=16 needs 28.58 MiB and BT=32 needs 57.19 MiB (NOT a Mosaic lowering
bug — the per-program working set scales linearly with BT: ~21 live
[BT, C, N] f32 planes plus the one-hot [BT, N, BINS] tensor). For BT>8,
``_compiler_params`` raises the per-kernel budget via
``pltpu.CompilerParams(vmem_limit_bytes=...)`` so larger tiles compile;
whether they are *faster* is an empirical question (bigger tiles trade
double-buffering headroom for fewer grid programs) — BT=8 remains the
measured-fastest default (``sim.core.default_block``, ``MDRLRMC_BLOCK``
overrides).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...sim.geometry import GEO, N_CHAINS, SLOTS, SPACING_M, VEH_LENGTH_M
from ...sim.physics import (
    AERO_DRAG_NS2_M2,
    BREAKDOWN_N_HI,
    BREAKDOWN_N_LO,
    BREAKDOWN_RATE_DOWN,
    BREAKDOWN_RATE_UP,
    CO2_IDLE_MGPS,
    CO2_PER_WHEEL_J_MG,
    DT_SUB,
    EMERGENCY_B,
    FRICTION_ALPHA,
    FRICTION_WINDOW_M,
    IDM_A,
    IDM_B,
    IDM_DELTA,
    IDM_S0,
    IDM_T,
    IDM_T_CROSS,
    MERGE_BIN_M as BIN_M,
    MERGE_BINS as BINS,
    NOX_IDLE_MGPS,
    NOX_PER_WHEEL_J_MG,
    ROLLING_RES_N,
    VEH_MASS_KG,
)

BIG = 1e9
# The hysteretic breakdown level is carried in SimState and passed in; the
# kernel only applies the resulting headway inflation inside the window.
MERGE_LO = float(GEO.merge_zone_lo + GEO.merge_offset)
MERGE_OFF = float(GEO.merge_offset)

_SEG_END = np.where(np.isfinite(GEO.seg_end), GEO.seg_end, BIG)
_SEG_START = np.concatenate(
    [np.zeros((N_CHAINS, 1), np.float32), _SEG_END[:, :-1]], axis=1)
_SEG_SPEED = np.asarray(GEO.seg_speed, np.float32)
_STOP = np.where(np.isfinite(GEO.stop_line), GEO.stop_line, BIG)


def _block_for(b: int, block: int, interpret: bool = False) -> int:
    """Env-tile size: ``block`` when it divides the batch, else the largest
    divisor of ``b`` that still fits one VMEM block. Never silently ``b``
    itself — a large non-multiple batch (e.g. a prime) would blow VMEM or
    fail Mosaic lowering far from the call site.

    Mosaic constraint (real TPU only): per-env arrays are (b, k) with the
    env axis on the sublane dimension, so the tile must be a multiple of 8
    OR the whole batch. A batch like 850 (= 17 snapshots x 50 episodes)
    has no such divisor <= 8 — raise HERE with the remedy instead of a
    block-shape error deep in pallas lowering (DeviceEvaluator pads its
    episode axis so S*E is always tile-aligned)."""
    if b % block == 0:
        bt = block
    else:
        bt = next(d for d in range(min(block, b), 0, -1) if b % d == 0)
    if not interpret and bt != b and bt % 8:
        raise ValueError(
            f"batch {b} has no lowerable env tile: largest divisor <= "
            f"{block} is {bt}, but Mosaic needs a multiple of 8 (or the "
            f"whole batch) on the sublane axis — pad the batch to a "
            f"multiple of {block}")
    return bt


def _compiler_params(bt: int):
    """Mosaic compiler params for an env-tile of ``bt`` envs.

    The default scoped-VMEM budget (16 MiB) fits BT=8 (~14.3 MiB working
    set); the working set scales linearly with BT (~1.8 MiB/env), so for
    larger tiles we raise the per-kernel budget via
    ``CompilerParams.vmem_limit_bytes`` — the kernel-scoped equivalent of
    ``--xla_tpu_scoped_vmem_limit_kib`` (which the axon client's XLA flag
    parser rejects). Capped at 100 MiB of the v5e core's 128 MiB VMEM to
    leave double-buffering headroom.
    """
    if bt <= 8:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 2**20, (2 * bt + 8) * 2**20))


def _sum_bc(x):
    """[BT, C, N] -> [BT, 1] total. Mosaic lowers a different reduction
    shape per mode: the fused ``sum(axis=(1, 2), keepdims=True)[:, :, 0]``
    form CHECK-crashes layout inference at BT>1, while the two-stage
    single-axis forms hit relayout / implicit-dimension errors at
    BT=1-under-vmap. The block shape is static, so branch."""
    if x.shape[0] == 1:
        return jnp.sum(x, axis=(1, 2), keepdims=True)[:, :, 0]
    return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)


def _suffix_min_pair(p, s):
    """Reverse cumulative min-by-key along the last axis of [BT, BINS]."""
    k = 1
    n = p.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, len(p.shape) - 1)
    while k < n:
        p_sh = pltpu.roll(p, n - k, axis=len(p.shape) - 1)
        s_sh = pltpu.roll(s, n - k, axis=len(s.shape) - 1)
        wrapped = col >= (n - k)
        p_sh = jnp.where(wrapped, BIG, p_sh)
        s_sh = jnp.where(wrapped, 0.0, s_sh)
        take = p <= p_sh
        p = jnp.where(take, p, p_sh)
        s = jnp.where(take, s, s_sh)
        k *= 2
    return p, s


def _bin_tables(pos_c, speed, act):
    """One-hot bins + per-bin (pos, speed) tables for one stream.

    pos_c: [BT, N] common-frame positions. Returns (oh [BT, N, BINS],
    pos_bin, spd_bin [BT, BINS])."""
    b = jnp.floor((pos_c - MERGE_LO) / BIN_M).astype(jnp.int32)
    in_zone = (act > 0.5) & (b >= 0) & (b < BINS)
    inz_f = jnp.where(in_zone, 1.0, 0.0)
    bin_col = jax.lax.broadcasted_iota(jnp.int32, (pos_c.shape[0], pos_c.shape[1], BINS), 2)
    # Bool minor-dim inserts are unsupported by Mosaic; build the one-hot
    # with f32 multiplies (i32/f32 inserts are fine).
    eq = jnp.where(b[:, :, None] == bin_col, 1.0, 0.0)
    oh = inz_f[:, :, None] * eq
    occupied = jnp.sum(oh, axis=1)
    pos_bin = jnp.sum(oh * (inz_f * pos_c)[:, :, None], axis=1)
    pos_bin = jnp.where(occupied > 0, pos_bin, BIG)
    spd_bin = jnp.sum(oh * speed[:, :, None], axis=1)
    return oh, pos_bin, spd_bin


def _lookup(oh, pos_c, act, sufp, sufs):
    """Cross-stream leader for each self vehicle via its own-bin one-hot."""
    col = jax.lax.broadcasted_iota(jnp.int32, sufp.shape, 1)
    sufp1 = pltpu.roll(sufp, BINS - 1, axis=1)
    sufs1 = pltpu.roll(sufs, BINS - 1, axis=1)
    last = col >= (BINS - 1)
    sufp1 = jnp.where(last, BIG, sufp1)
    sufs1 = jnp.where(last, 0.0, sufs1)

    p0 = jnp.sum(oh * sufp[:, None, :], axis=2)
    s0 = jnp.sum(oh * sufs[:, None, :], axis=2)
    p1 = jnp.sum(oh * sufp1[:, None, :], axis=2)
    s1 = jnp.sum(oh * sufs1[:, None, :], axis=2)
    in_zone = jnp.sum(oh, axis=2) > 0.5

    use0 = p0 > pos_c
    lead_p = jnp.where(use0, p0, p1)
    lead_s = jnp.where(use0, s0, s1)
    gap = jnp.where(in_zone & (act > 0.5), lead_p - pos_c - VEH_LENGTH_M, BIG)
    return gap, jnp.where(gap < 1e8, lead_s, 0.0)


def _substep_body(pos, speed, act, wait, head, red, friction, seg_start,
                  seg_end, seg_speed, stop_line, noise=None):
    """One DT_SUB physics step. pos/speed/act/wait [BT, C, N]; head
    [BT, C]; red/friction [BT, 1, 1]; segment tables [S, C];
    stop_line [C, 1]; noise: optional [BT, C, N] driver-imperfection
    accel jitter (config.ScenarioConfig.accel_noise_sigma) — pre-drawn
    OUTSIDE the kernel from the same stream the XLA path uses, like the
    spawn uniforms, so both paths stay bit-comparable."""
    col = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 2)

    lead_pos = pltpu.roll(pos, 1, axis=2)
    lead_speed = pltpu.roll(speed, 1, axis=2)
    is_head = col == head[:, :, None]
    lead_pos = jnp.where(is_head, BIG, lead_pos)
    lead_speed = jnp.where(is_head, 0.0, lead_speed)
    gap = lead_pos - pos - VEH_LENGTH_M
    dv = jnp.where(gap < 1e8, speed - lead_speed, 0.0)

    # Stop line while red.
    stop = stop_line[None, :, :]          # [1, C, 1]
    stop_gap = stop - pos
    use_stop = (red > 0.5) & (pos < stop) & (stop_gap < gap)
    gap = jnp.where(use_stop, stop_gap, gap)
    dv = jnp.where(use_stop, speed, dv)

    # Zipper-merge coupling: chain 3 <-> chain 0 in the common frame.
    m3 = pos[:, 3, :] + MERGE_OFF
    oh0, pb0, sb0 = _bin_tables(pos[:, 0, :], speed[:, 0, :], act[:, 0, :])
    oh3, pb3, sb3 = _bin_tables(m3, speed[:, 3, :], act[:, 3, :])
    sufp0, sufs0 = _suffix_min_pair(pb0, sb0)
    sufp3, sufs3 = _suffix_min_pair(pb3, sb3)
    g3x, s3x = _lookup(oh3, m3, act[:, 3, :], sufp0, sufs0)
    g0x, s0x = _lookup(oh0, pos[:, 0, :], act[:, 0, :], sufp3, sufs3)

    chain_row = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 1)
    g_cross = jnp.full_like(gap, BIG)
    s_cross = jnp.zeros_like(gap)
    g_cross = jnp.where(chain_row == 0, g0x[:, None, :], g_cross)
    s_cross = jnp.where(chain_row == 0, s0x[:, None, :], s_cross)
    g_cross = jnp.where(chain_row == 3, g3x[:, None, :], g_cross)
    s_cross = jnp.where(chain_row == 3, s3x[:, None, :], s_cross)
    use_cross = g_cross < gap
    gap = jnp.where(use_cross, g_cross, gap)
    dv = jnp.where(use_cross, speed - s_cross, dv)
    base_t = jnp.where(use_cross, IDM_T_CROSS, IDM_T)

    # Speed limit by segment slab (unrolled over the 5 segments). Tables
    # arrive [S, C] so the per-segment slice is on the sublane axis (a
    # lane-axis slice would lower to a gather).
    v0 = jnp.zeros_like(pos)
    for s in range(seg_end.shape[0]):
        lo = seg_start[s:s + 1, :][:, :, None]
        hi = seg_end[s:s + 1, :][:, :, None]
        sp = seg_speed[s:s + 1, :][:, :, None]
        v0 = v0 + jnp.where((pos >= lo) & (pos < hi), sp, 0.0)
    v0 = jnp.where(v0 > 0, v0, 27.77)

    # Breakdown-driven merge friction (chains 0-3; sim/core._substep
    # parity — the hysteresis state updates once per sim second in XLA).
    fr_lo = MERGE_LO - FRICTION_WINDOW_M
    pos_common = jnp.where(chain_row == 3, pos + MERGE_OFF, pos)
    in_window = (act > 0.5) & (pos_common >= fr_lo) & (chain_row != 4)
    zmask = jnp.where(in_window, 1.0, 0.0)
    t_headway = base_t * (1.0 + (friction - 1.0) * zmask)

    # IDM acceleration + semi-implicit Euler (identical to sim.core).
    s_star = IDM_S0 + speed * t_headway + speed * dv / (2.0 * np.sqrt(IDM_A * IDM_B))
    s_star = jnp.maximum(s_star, IDM_S0)
    g = jnp.maximum(gap, 0.1)
    ratio = speed / jnp.maximum(v0, 0.1)
    r2 = ratio * ratio
    acc = IDM_A * (1.0 - r2 * r2 - (s_star / g) * (s_star / g))
    acc = jnp.clip(acc, -EMERGENCY_B, IDM_A)
    if noise is not None:
        # Same rule as sim.core._substep: jitter the clipped IDM response,
        # re-clip to the identical physical bounds.
        acc = jnp.clip(acc + noise, -EMERGENCY_B, IDM_A)

    active = act > 0.5
    new_speed = jnp.where(active, jnp.maximum(speed + acc * DT_SUB, 0.0), 0.0)
    new_pos = jnp.where(active, pos + new_speed * DT_SUB, pos)
    new_wait = jnp.where(active & (new_speed < 0.1), wait + DT_SUB, wait)
    return new_pos, new_speed, new_wait


def _kernel(pos_ref, speed_ref, act_ref, wait_ref, head_ref, red_ref,
            fric_ref, seg_start_ref, seg_end_ref, seg_speed_ref, stop_ref,
            pos_out, speed_out, wait_out, *, substeps: int):
    pos = pos_ref[:]
    speed = speed_ref[:]
    act = act_ref[:]
    wait = wait_ref[:]
    head = head_ref[:]
    red = red_ref[:][:, :, None]
    friction = fric_ref[:][:, :, None]
    seg_start = seg_start_ref[:]
    seg_end = seg_end_ref[:]
    seg_speed = seg_speed_ref[:]
    stop = stop_ref[:]
    for _ in range(substeps):
        pos, speed, wait = _substep_body(
            pos, speed, act, wait, head, red, friction,
            seg_start, seg_end, seg_speed, stop)
    pos_out[:] = pos
    speed_out[:] = speed
    wait_out[:] = wait


@functools.partial(jax.jit, static_argnames=("substeps", "block", "interpret"))
def fused_substeps(pos, speed, active, wait, head, red, breakdown=None, *,
                   substeps: int = 2, block: int = 8, interpret: bool = False):
    """Run ``substeps`` physics steps for a batch of envs in one kernel.

    pos/speed/active/wait: [B, C, N] f32 (active as 0/1); head: [B, C]
    int32; red: [B] f32 (1.0 while the meter is red); breakdown: [B] f32
    merge-breakdown level (defaults to 0). Returns (pos, speed, wait).
    """
    b = pos.shape[0]
    bt = _block_for(b, block, interpret)
    grid = (b // bt,)
    spec3 = pl.BlockSpec((bt, N_CHAINS, SLOTS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((bt, N_CHAINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_seg = _SEG_END.shape[1]
    seg_spec = pl.BlockSpec((n_seg, N_CHAINS), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    stop_spec = pl.BlockSpec((N_CHAINS, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    seg_start = jnp.asarray(_SEG_START.T, jnp.float32)
    seg_end = jnp.asarray(_SEG_END.T, jnp.float32)
    seg_speed = jnp.asarray(_SEG_SPEED.T, jnp.float32)
    stop = jnp.asarray(_STOP, jnp.float32).reshape(N_CHAINS, 1)
    if breakdown is None:
        breakdown = jnp.zeros((b,), jnp.float32)
    friction = 1.0 + FRICTION_ALPHA * breakdown
    return pl.pallas_call(
        functools.partial(_kernel, substeps=substeps),
        out_shape=(
            jax.ShapeDtypeStruct(pos.shape, jnp.float32),
            jax.ShapeDtypeStruct(pos.shape, jnp.float32),
            jax.ShapeDtypeStruct(pos.shape, jnp.float32),
        ),
        grid=grid,
        in_specs=[spec3, spec3, spec3, spec3, spec2, spec1, spec1,
                  seg_spec, seg_spec, seg_spec, stop_spec],
        out_specs=(spec3, spec3, spec3),
        compiler_params=_compiler_params(bt),
        interpret=interpret,
    )(pos, speed, active, wait, head, red[:, None], friction[:, None],
      seg_start, seg_end, seg_speed, stop)


# ---------------------------------------------------------------------------
# Physics + detector integration in one kernel (sim/core.step_1s hot parts).
# Loop tables arrive transposed [K, C] so per-slot slices hit the sublane
# axis (see the segment-table note above).
# ---------------------------------------------------------------------------


def _detector_block(p0, p1, speed, act, loop_kc):
    """Per-1s-step detector aggregates. p0/p1/speed/act: [BT, C, N];
    loop_kc: [K, C]. Returns counts/speed_sum/occ_time [BT, C, K]."""
    k_slots = loop_kc.shape[0]
    active = act > 0.5
    dur_unit = jnp.where(
        active, jnp.minimum(1.0, VEH_LENGTH_M / jnp.maximum(speed, 0.18)), 0.0)
    # Iota-masked select writes rather than jnp.stack(axis=2): stacking
    # along a NEW minor axis is fragile under Mosaic layout inference at
    # BT>1, while [BT,C]->[BT,C,1] f32 broadcasts lower fine.
    shape = (p0.shape[0], p0.shape[1], k_slots)
    kcol = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    cnt = jnp.zeros(shape, jnp.float32)
    spd = jnp.zeros(shape, jnp.float32)
    occ = jnp.zeros(shape, jnp.float32)
    for k in range(k_slots):
        x = loop_kc[k:k + 1, :][:, :, None]          # [1, C, 1]
        crossed = active & (p0 < x) & (p1 >= x)
        c_k = jnp.sum(jnp.where(crossed, 1.0, 0.0), axis=2)      # [BT, C]
        s_k = jnp.sum(jnp.where(crossed, speed, 0.0), axis=2)
        covering = (p1 >= x) & (p0 <= x + VEH_LENGTH_M)
        o_k = jnp.minimum(
            jnp.sum(jnp.where(covering, dur_unit, 0.0), axis=2), 1.0)
        sel = kcol == k
        cnt = jnp.where(sel, c_k[:, :, None], cnt)
        spd = jnp.where(sel, s_k[:, :, None], spd)
        occ = jnp.where(sel, o_k[:, :, None], occ)
    return cnt, spd, occ


def _step_kernel(pos_ref, speed_ref, act_ref, wait_ref, head_ref, red_ref,
                 fric_ref, seg_start_ref, seg_end_ref, seg_speed_ref, stop_ref,
                 loop_ref,
                 pos_out, speed_out, wait_out, cnt_out, spd_out, occ_out,
                 queue_out, *, substeps: int):
    pos = pos_ref[:]
    speed = speed_ref[:]
    act = act_ref[:]
    wait = wait_ref[:]
    head = head_ref[:]
    red = red_ref[:][:, :, None]
    friction = fric_ref[:][:, :, None]
    seg_start = seg_start_ref[:]
    seg_end = seg_end_ref[:]
    seg_speed = seg_speed_ref[:]
    stop = stop_ref[:]
    p0 = pos
    for _ in range(substeps):
        pos, speed, wait = _substep_body(
            pos, speed, act, wait, head, red, friction,
            seg_start, seg_end, seg_speed, stop)
    cnt, spd, occ = _detector_block(p0, pos, speed, act, loop_ref[:])
    # Ramp queue: active chain-3 vehicles still on the on_ramp edge.
    ramp_end = float(GEO.ramp_edge_end)
    chain_row = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 1)
    on_ramp = (act > 0.5) & (chain_row == 3) & (pos <= ramp_end)
    queue_out[:] = _sum_bc(jnp.where(on_ramp, 1.0, 0.0))
    pos_out[:] = pos
    speed_out[:] = speed
    wait_out[:] = wait
    cnt_out[:] = cnt
    spd_out[:] = spd
    occ_out[:] = occ


@functools.partial(jax.jit, static_argnames=("substeps", "block", "interpret"))
def fused_step(pos, speed, active, wait, head, red, breakdown=None, *,
               substeps: int = 2, block: int = 8, interpret: bool = False):
    """Physics substeps + detector integration + queue count in one kernel.

    Returns (pos, speed, wait, counts [B,C,K], speed_sum [B,C,K],
    occ_time [B,C,K], queue [B]).
    """
    from ...sim.geometry import LOOPS_PER_CHAIN

    b = pos.shape[0]
    bt = _block_for(b, block, interpret)
    grid = (b // bt,)
    spec3 = pl.BlockSpec((bt, N_CHAINS, SLOTS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((bt, N_CHAINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    speck = pl.BlockSpec((bt, N_CHAINS, LOOPS_PER_CHAIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    n_seg = _SEG_END.shape[1]
    seg_spec = pl.BlockSpec((n_seg, N_CHAINS), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    stop_spec = pl.BlockSpec((N_CHAINS, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    loop_spec = pl.BlockSpec((LOOPS_PER_CHAIN, N_CHAINS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    seg_start = jnp.asarray(_SEG_START.T, jnp.float32)
    seg_end = jnp.asarray(_SEG_END.T, jnp.float32)
    seg_speed = jnp.asarray(_SEG_SPEED.T, jnp.float32)
    stop = jnp.asarray(_STOP, jnp.float32).reshape(N_CHAINS, 1)
    loop_kc = jnp.asarray(GEO.loop_table_pos.T, jnp.float32)
    if breakdown is None:
        breakdown = jnp.zeros((b,), jnp.float32)
    friction = 1.0 + FRICTION_ALPHA * breakdown
    shp3 = jax.ShapeDtypeStruct(pos.shape, jnp.float32)
    shpk = jax.ShapeDtypeStruct((b, N_CHAINS, LOOPS_PER_CHAIN), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_step_kernel, substeps=substeps),
        out_shape=(shp3, shp3, shp3, shpk, shpk, shpk,
                   jax.ShapeDtypeStruct((b, 1), jnp.float32)),
        grid=grid,
        in_specs=[spec3, spec3, spec3, spec3, spec2, spec1, spec1,
                  seg_spec, seg_spec, seg_spec, stop_spec, loop_spec],
        out_specs=(spec3, spec3, spec3, speck, speck, speck, spec1),
        compiler_params=_compiler_params(bt),
        interpret=interpret,
    )(pos, speed, active, wait, head, red[:, None], friction[:, None],
      seg_start, seg_end, seg_speed, stop, loop_kc)
    pos, speed, wait, cnt, spd, occ, queue = out
    return pos, speed, wait, cnt, spd, occ, queue[:, 0]


# ---------------------------------------------------------------------------
# The COMPLETE 1 s sim step in one kernel: physics substeps + detectors +
# emissions + breakdown hysteresis + arrival pop + demand spawn
# (sim/core.step_1s in its entirety). The per-second XLA epilogue shrinks to
# the accumulator adds; the 40-step control cycle becomes 40 kernel calls
# with no small-HLO dispatch between them.
#
# Head/tail ring-buffer reads become one-hot masked reductions and the
# writes one-hot selects (no gather/scatter — the VPU-native subset, like
# the merge binning above). Spawn randomness (the connected-class draw) is
# pre-drawn OUTSIDE from the same stream the XLA path uses, so both paths
# stay bit-comparable (tests/test_pallas.py).
# ---------------------------------------------------------------------------

_CHAIN_LEN_FFTT = np.stack(
    [np.asarray(GEO.chain_length, np.float32),
     np.asarray(GEO.freeflow_tt, np.float32)], axis=0)       # [2, C]
RAMP_EDGE_END = float(GEO.ramp_edge_end)


def _full_kernel(pos_ref, speed_ref, act_ref, conn_ref, wait_ref, depart_ref,
                 head_ref, count_ref, pending_ref,
                 red_ref, bkd_ref, t_ref, pen_ref, ucon_ref, rate_ref,
                 *refs, substeps: int, noisy: bool = False):
    # Optional driver-noise input ([BT, substeps*C, N], substep-major)
    # arrives between the state inputs and the constant tables; peel it
    # off positionally so the sigma=0 kernel keeps its exact historical
    # signature (and compiled artifact).
    if noisy:
        noise_ref, *refs = refs
    else:
        noise_ref = None
    (seg_start_ref, seg_end_ref, seg_speed_ref, stop_ref,
     loop_ref, clen_ref,
     pos_out, speed_out, act_out, conn_out, wait_out, depart_out,
     head_out, count_out, pending_out,
     cnt_out, spd_out, occ_out,
     queue_out, bkd_out,
     arr_out, trav_out, loss_out, waitsum_out,
     co2_out, nox_out, dep_out) = refs
    pos = pos_ref[:]
    speed = speed_ref[:]
    act = act_ref[:]
    conn = conn_ref[:]
    wait = wait_ref[:]
    depart = depart_ref[:]
    head = head_ref[:]
    count = count_ref[:]
    pending = pending_ref[:]
    red = red_ref[:][:, :, None]
    b_in = bkd_ref[:]                       # [BT, 1]
    t_new = t_ref[:] + 1.0                  # [BT, 1] sim time after this step
    pen = pen_ref[:]                        # [BT, 1]
    ucon = ucon_ref[:]                      # [BT, C]
    rate = rate_ref[:]                      # [BT, C] veh/s
    seg_start = seg_start_ref[:]
    seg_end = seg_end_ref[:]
    seg_speed = seg_speed_ref[:]
    stop = stop_ref[:]
    chain_len = clen_ref[0:1, :]            # [1, C]
    fftt = clen_ref[1:2, :]                 # [1, C]

    # --- physics (friction from the step-entry breakdown level) ---
    friction = (1.0 + FRICTION_ALPHA * b_in)[:, :, None]     # [BT, 1, 1]
    p0 = pos
    speed0 = speed
    for k in range(substeps):
        ns = None
        if noise_ref is not None:
            # Substep-major packing: slice on the sublane axis (static
            # offsets — a lane-axis slice would lower to a gather).
            ns = noise_ref[:, k * N_CHAINS:(k + 1) * N_CHAINS, :]
        pos, speed, wait = _substep_body(
            pos, speed, act, wait, head, red, friction,
            seg_start, seg_end, seg_speed, stop, noise=ns)

    # --- detectors + ramp queue (post-physics, pre-pop: sim.core order) ---
    cnt, spd, occ = _detector_block(p0, pos, speed, act, loop_ref[:])
    chain_row = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 1)
    on_ramp = (act > 0.5) & (chain_row == 3) & (pos <= RAMP_EDGE_END)
    queue_out[:] = _sum_bc(jnp.where(on_ramp, 1.0, 0.0))

    # --- emissions (wheel-power model over the 1 s step) ---
    a = speed - speed0
    p_wheel = (ROLLING_RES_N + AERO_DRAG_NS2_M2 * speed * speed) * speed \
        + VEH_MASS_KG * speed * a
    p_wheel = jnp.where(p_wheel > 0, p_wheel, 0.0)
    active = act > 0.5
    co2_out[:] = _sum_bc(
        jnp.where(active, CO2_IDLE_MGPS + CO2_PER_WHEEL_J_MG * p_wheel, 0.0))
    nox_out[:] = _sum_bc(
        jnp.where(active, NOX_IDLE_MGPS + NOX_PER_WHEEL_J_MG * p_wheel, 0.0))

    # --- merge-breakdown hysteresis (post-physics zone count) ---
    fr_lo = MERGE_LO - FRICTION_WINDOW_M
    pos_common = jnp.where(chain_row == 3, pos + MERGE_OFF, pos)
    in_window = active & (pos_common >= fr_lo) & (chain_row != 4)
    n_zone = _sum_bc(jnp.where(in_window, 1.0, 0.0))         # [BT, 1]
    b = jnp.where(n_zone > BREAKDOWN_N_HI,
                  jnp.minimum(b_in + BREAKDOWN_RATE_UP, 1.0), b_in)
    b = jnp.where(n_zone < BREAKDOWN_N_LO,
                  jnp.maximum(b - BREAKDOWN_RATE_DOWN, 0.0), b)
    bkd_out[:] = b

    # --- pop up to 2 arrived head vehicles per chain ---
    col = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 2)
    arr_d = jnp.zeros(head.shape, jnp.float32)
    trav_d = jnp.zeros(head.shape, jnp.float32)
    loss_d = jnp.zeros(head.shape, jnp.float32)
    waitsum_d = jnp.zeros(head.shape, jnp.float32)
    for _ in range(2):
        is_head = col == head[:, :, None]
        head_act = jnp.sum(jnp.where(is_head, act, 0.0), axis=2)
        head_pos = jnp.sum(jnp.where(is_head, pos, 0.0), axis=2)
        head_dep = jnp.sum(jnp.where(is_head, depart, 0.0), axis=2)
        head_wait = jnp.sum(jnp.where(is_head, wait, 0.0), axis=2)
        done = (head_act > 0.5) & (head_pos > chain_len)
        d = jnp.where(done, 1.0, 0.0)
        travel = t_new - head_dep
        arr_d = arr_d + d
        trav_d = trav_d + d * travel
        loss_d = loss_d + d * jnp.maximum(travel - fftt, 0.0)
        waitsum_d = waitsum_d + d * head_wait
        # bool [BT,C]->[BT,C,1] inserts are unsupported by Mosaic; route
        # the select through the f32 flag.
        m = is_head & (d[:, :, None] > 0.5)
        act = jnp.where(m, 0.0, act)
        pos = jnp.where(m, BIG, pos)
        head = jnp.where(done, head + 1, head)
        head = jnp.where(head >= SLOTS, head - SLOTS, head)
        count = jnp.where(done, count - 1, count)
    arr_out[:] = arr_d
    trav_out[:] = trav_d
    loss_out[:] = loss_d
    waitsum_out[:] = waitsum_d

    # --- spawn (demand arrival + tail insertion, departSpeed=max) ---
    pending = pending + rate                                  # dt = 1 s
    tail = head + count
    tail = jnp.where(tail >= SLOTS, tail - SLOTS, tail)
    tailp = tail - 1
    tailp = jnp.where(tailp < 0, tailp + SLOTS, tailp)
    is_tail = col == tail[:, :, None]
    is_tailp = col == tailp[:, :, None]
    prev_act = (jnp.sum(jnp.where(is_tailp, act, 0.0), axis=2) > 0.5) \
        & (count > 0)
    prev_pos = jnp.where(
        prev_act, jnp.sum(jnp.where(is_tailp, pos, 0.0), axis=2), BIG)
    entry_gap = prev_pos - VEH_LENGTH_M
    can = (pending >= 1.0) & (entry_gap > SPACING_M) & (count < SLOTS - 2)
    v_entry = jnp.minimum(seg_speed[0:1, :], entry_gap / IDM_T)   # [BT, C]
    is_con_new = jnp.where(ucon < pen, 1.0, 0.0)
    canf = jnp.where(can, 1.0, 0.0)
    m = is_tail & (canf[:, :, None] > 0.5)
    pos = jnp.where(m, 0.0, pos)
    speed = jnp.where(m, v_entry[:, :, None], speed)
    act = jnp.where(m, 1.0, act)
    conn = jnp.where(m, is_con_new[:, :, None], conn)
    depart = jnp.where(m, t_new[:, :, None], depart)
    wait = jnp.where(m, 0.0, wait)
    count = jnp.where(can, count + 1, count)
    pending = pending - canf
    dep_out[:] = jnp.sum(canf, axis=1, keepdims=True)

    pos_out[:] = pos
    speed_out[:] = speed
    act_out[:] = act
    conn_out[:] = conn
    wait_out[:] = wait
    depart_out[:] = depart
    head_out[:] = head
    count_out[:] = count
    pending_out[:] = pending
    cnt_out[:] = cnt
    spd_out[:] = spd
    occ_out[:] = occ


@functools.partial(jax.jit, static_argnames=("substeps", "block", "interpret"))
def fused_step_full(pos, speed, active, conn, wait, depart, head, count,
                    pending, red, breakdown, t, pen, ucon, rate, noise=None,
                    *, substeps: int = 2, block: int = 8,
                    interpret: bool = False):
    """One complete sim second for a batch of envs in one kernel.

    pos/speed/active/conn/wait/depart: [B, C, N] f32 (masks as 0/1);
    head/count: [B, C] i32; pending: [B, C] f32; red/breakdown/t/pen: [B]
    f32; ucon/rate: [B, C] f32 (pre-drawn connected-class uniforms, demand
    rate veh/s); noise: optional [B, substeps, C, N] f32 driver-
    imperfection accel jitter, pre-drawn outside like ucon (sigma > 0
    path; None keeps the historical kernel). Returns the updated state
    arrays plus this step's detector
    aggregates, ramp queue, new breakdown level, trip-stat deltas
    (arrived/travel/loss/wait per chain) and co2/nox/departed deltas.
    """
    from ...sim.geometry import LOOPS_PER_CHAIN

    b = pos.shape[0]
    bt = _block_for(b, block, interpret)
    grid = (b // bt,)
    spec3 = pl.BlockSpec((bt, N_CHAINS, SLOTS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((bt, N_CHAINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    speck = pl.BlockSpec((bt, N_CHAINS, LOOPS_PER_CHAIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    n_seg = _SEG_END.shape[1]
    seg_spec = pl.BlockSpec((n_seg, N_CHAINS), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    stop_spec = pl.BlockSpec((N_CHAINS, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    loop_spec = pl.BlockSpec((LOOPS_PER_CHAIN, N_CHAINS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    clen_spec = pl.BlockSpec((2, N_CHAINS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    seg_start = jnp.asarray(_SEG_START.T, jnp.float32)
    seg_end = jnp.asarray(_SEG_END.T, jnp.float32)
    seg_speed = jnp.asarray(_SEG_SPEED.T, jnp.float32)
    stop = jnp.asarray(_STOP, jnp.float32).reshape(N_CHAINS, 1)
    loop_kc = jnp.asarray(GEO.loop_table_pos.T, jnp.float32)
    clen = jnp.asarray(_CHAIN_LEN_FFTT)

    shp3 = jax.ShapeDtypeStruct(pos.shape, jnp.float32)
    shp2f = jax.ShapeDtypeStruct((b, N_CHAINS), jnp.float32)
    shp2i = jax.ShapeDtypeStruct((b, N_CHAINS), jnp.int32)
    shp1 = jax.ShapeDtypeStruct((b, 1), jnp.float32)
    shpk = jax.ShapeDtypeStruct((b, N_CHAINS, LOOPS_PER_CHAIN), jnp.float32)
    noisy = noise is not None
    noise_in, noise_specs = (), []
    if noisy:
        # Substep-major [B, substeps*C, N] so the kernel's per-substep
        # slice lands on the sublane axis.
        noise_in = (jnp.reshape(noise, (b, substeps * N_CHAINS, SLOTS)),)
        noise_specs = [pl.BlockSpec((bt, substeps * N_CHAINS, SLOTS),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
    out = pl.pallas_call(
        functools.partial(_full_kernel, substeps=substeps, noisy=noisy),
        out_shape=(shp3, shp3, shp3, shp3, shp3, shp3,      # pos..depart
                   shp2i, shp2i, shp2f,                     # head/count/pending
                   shpk, shpk, shpk,                        # cnt/spd/occ
                   shp1, shp1,                              # queue, breakdown
                   shp2f, shp2f, shp2f, shp2f,              # arr/trav/loss/wait
                   shp1, shp1, shp1),                       # co2, nox, departed
        grid=grid,
        in_specs=[spec3, spec3, spec3, spec3, spec3, spec3,
                  spec2, spec2, spec2,
                  spec1, spec1, spec1, spec1, spec2, spec2,
                  *noise_specs,
                  seg_spec, seg_spec, seg_spec, stop_spec, loop_spec,
                  clen_spec],
        out_specs=(spec3, spec3, spec3, spec3, spec3, spec3,
                   spec2, spec2, spec2,
                   speck, speck, speck,
                   spec1, spec1,
                   spec2, spec2, spec2, spec2,
                   spec1, spec1, spec1),
        compiler_params=_compiler_params(bt),
        interpret=interpret,
    )(pos, speed, active, conn, wait, depart, head, count, pending,
      red[:, None], breakdown[:, None], t[:, None], pen[:, None], ucon, rate,
      *noise_in,
      seg_start, seg_end, seg_speed, stop, loop_kc, clen)
    return out
