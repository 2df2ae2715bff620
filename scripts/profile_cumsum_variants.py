"""A/B prefix-sum implementations for the chunked PER sampler hot spot.

profile_per_sample.py breakdown: the [32,1024] lane-axis jnp.cumsum costs
~46 us/step and the [1024] chunk cumsum ~15 us/step — together >75% of
the PER residual. Candidates (each as a k=256 scan like train_many):

  cumsum      jnp.cumsum (current)
  matmul      x @ triu_ones on the MXU, f32 HIGHEST precision
  two-level   reshape to 32x32 subchunks: intra-cumsum + subtotal cumsum

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_cumsum_variants.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from scripts.profile_per import K, timeit

B, KK = 32, 1024


def scan_k(body):
    @jax.jit
    def run(x, rng):
        def step(carry, _):
            r, chk = carry
            r, sub = jax.random.split(r)
            y = body(x + chk * 0.0)
            return (r, chk + y[..., -1].sum()), None
        return jax.lax.scan(step, (rng, jnp.zeros(())), None, length=K)[0][1]
    return run


def v_cumsum(x):
    return jnp.cumsum(x, axis=-1)


TRIU = None


def v_matmul(x):
    return lax.dot_general(
        x, TRIU, (((x.ndim - 1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


def v_twolevel(x):
    s = 32
    sub = x.reshape(*x.shape[:-1], KK // s, s)
    intra = jnp.cumsum(sub, axis=-1)
    totals = intra[..., -1]
    base = jnp.cumsum(totals, axis=-1) - totals
    return (intra + base[..., None]).reshape(x.shape)


def main() -> None:
    global TRIU
    print(f"backend={jax.default_backend()} shapes [{B},{KK}] and [{KK}]")
    rng = jax.random.PRNGKey(0)
    TRIU = jnp.triu(jnp.ones((KK, KK), jnp.float32))
    for shape in [(B, KK), (KK,)]:
        x = jax.random.uniform(rng, shape, minval=0.01, maxval=1.0)
        for name, fn in [("cumsum", v_cumsum), ("matmul", v_matmul),
                         ("two-level", v_twolevel)]:
            # Correctness vs float64-free reference first.
            want = jnp.cumsum(x, axis=-1)
            got = fn(x)
            err = float(jnp.max(jnp.abs(got - want) / jnp.maximum(want, 1e-6)))
            t = timeit(scan_k(fn), x, rng)
            print(f"{shape!s:12s} {name:9s}: {t / K * 1e6:6.1f} us/step "
                  f"(max rel diff vs cumsum {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
