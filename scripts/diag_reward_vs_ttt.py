"""Diagnostic: episode reward vs TTT for fixed policies + the trained DQN
on the device sim. Same demand draws across policies (same reset rngs).

If FixedCycle out-rewards the trained DQN, the DQN is under-trained
(replay-ratio theory); if the DQN out-rewards FixedCycle but has worse TTT,
the reward and the TTT metric disagree in this simulator.
"""
import jax
import jax.numpy as jnp

from multimodal_drl_rmc_tpu.config import Config, EnvConfig, NetworkSpec
from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv
from multimodal_drl_rmc_tpu.models import packio
from multimodal_drl_rmc_tpu.models.networks import build_network, greedy_fn

B = 64
CYCLES = 90  # 3600 s episode

cfg = Config()
env = DeviceRampEnv(cfg.env, B)

net = build_network(NetworkSpec(), 8)
params, meta = packio.load_pack(
    "save/1ramp_1x3/DuelingDoubleDQNAgent_lr0.0001_model.pack", NetworkSpec())
greedy = jax.jit(greedy_fn(net))


def run(policy_fn, name):
    rng = jax.random.PRNGKey(123)
    states, obs = env.reset(rng)
    ret = jnp.zeros((B,))
    queues = []
    pre_reset = states
    for t in range(CYCLES):
        pre_reset = states
        acts = policy_fn(obs, t)
        states, (obs_final, obs_next, rew, done, m) = env.step(states, acts)
        ret = ret + rew
        queues.append(m.ramp_queue_veh)
        obs = obs_next
    # The final step auto-resets; measure trip stats at 1 cycle before end
    # (t = 3565 s) — consistent across policies.
    sim = pre_reset.sim
    # TTT proxy: completed-trip travel + in-network vehicles' elapsed time
    elapsed = jnp.where(sim.active, sim.t[:, None, None] - sim.depart_t,
                        0.0).sum(axis=(1, 2))
    ttt = sim.travel_sum.sum(axis=1) + elapsed
    q = jnp.stack(queues)
    print(f"{name:14s} reward/ep {ret.mean():8.2f}  TTT {ttt.mean():10.0f}  "
          f"arrived {sim.arrived.sum(axis=1).mean():6.0f}  "
          f"loss_sum {sim.loss_sum.sum(axis=1).mean():9.0f}  "
          f"co2 {sim.co2_sum.mean():.3e}  "
          f"queue mean {q.mean():5.1f} max {q.max():5.1f}")


run(lambda obs, t: jnp.full((B,), 3, jnp.int32), "FixedCycle20")
run(lambda obs, t: jnp.full((B,), 7, jnp.int32), "AlwaysGreen")
run(lambda obs, t: jnp.full((B,), 0, jnp.int32), "Green5")
run(lambda obs, t: jnp.full((B,), 4, jnp.int32), "Green25")
run(lambda obs, t: jnp.full((B,), 2, jnp.int32), "Green15")
run(lambda obs, t: greedy(params, obs), "DQN(trained)")

params2, meta2 = packio.load_pack(
    "save/r2_hybrid/DuelingDoubleDQNAgent_lr0.0001_model.pack", NetworkSpec())
run(lambda obs, t: greedy(params2, obs), "DQN(r2-ratio1)")
