"""Fused dueling-head action selection as a Pallas TPU kernel.

The greedy-action path (reference DuelingDeepQNetwork.actions,
dqn/network.py:110-117: advantage head -> argmax) runs once per actor step.
XLA emits matmul + bias + argmax as separate HLOs; this kernel fuses the
[B, F] x [F, A] advantage matmul (MXU), bias add, and the masked argmax
reduction (VPU) into one pallas_call — trunk features in, int32 actions out.

Shapes: F (trunk features, 256) and the padded action lane width (128) are
both MXU/VPU native. A (=8) real actions are padded to 128 lanes with -inf
so the argmax ignores the padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(feat_ref, w_ref, b_ref, out_ref, *, n_actions: int):
    feat = feat_ref[:]                       # [Bt, F]
    adv = jnp.dot(feat, w_ref[:], preferred_element_type=jnp.float32)
    adv = adv + b_ref[:]                     # [Bt, LANE] (padded)
    col = jax.lax.broadcasted_iota(jnp.int32, adv.shape, 1)
    adv = jnp.where(col < n_actions, adv, -jnp.inf)
    # argmax as masked min-index (Mosaic has no direct f32->i32 argmax):
    # first column attaining the row max, ties -> lowest index (matches
    # jnp.argmax).
    row_max = jnp.max(adv, axis=-1, keepdims=True)
    idx = jnp.where(adv == row_max, col, LANE)
    out_ref[:] = jnp.min(idx, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dueling_greedy_actions(feat: jax.Array, w_adv: jax.Array, b_adv: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """argmax_a(feat @ w_adv + b_adv) fused on TPU.

    feat: [B, F] f32; w_adv: [F, A]; b_adv: [A]. Returns [B] int32.
    """
    batch, f = feat.shape
    n_actions = w_adv.shape[1]
    w_pad = jnp.zeros((f, LANE), jnp.float32).at[:, :n_actions].set(w_adv)
    b_pad = jnp.full((1, LANE), -jnp.inf, jnp.float32).at[0, :n_actions].set(b_adv)

    bt = min(batch, 512)
    if batch % bt:
        bt = batch  # odd batch: single tile

    out = pl.pallas_call(
        functools.partial(_kernel, n_actions=n_actions),
        out_shape=jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        grid=(batch // bt,),
        in_specs=[
            pl.BlockSpec((bt, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(feat, w_pad, b_pad)
    return out[:, 0]


def greedy_fn_pallas(net, params, interpret: bool = False):
    """Greedy (params, obs) -> actions using the fused kernel for the
    advantage head; the trunk stays XLA (conv/dense fusion is already
    optimal there). Falls back to plain argmax for non-dueling nets."""
    from ...models.networks import DuelingQNetwork

    if not isinstance(net, DuelingQNetwork):
        return lambda obs: jnp.argmax(net.apply(params, obs), axis=-1)

    adv_layer = params["params"]["fc_adv"]
    w, b = adv_layer["kernel"], adv_layer["bias"]

    def fn(obs):
        feat = net.apply(params, obs, method=lambda m, x: m.trunk(x))
        return dueling_greedy_actions(feat, w, b, interpret=interpret)

    return fn
