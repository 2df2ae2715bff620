"""Q-networks as Flax modules, TPU-first.

Covers the reference's network zoo:
  * ``DeepQNetwork``/``DuelingDeepQNetwork`` heads (dqn/network.py:50-117)
  * ``TwoStreamHybridNetwork`` trunk (env/dqn_config.py:66-143)
  * macro-variant MLP trunk ('macro with lane/dqn_config.py':60-105)

Design notes (TPU):
  * Convolutions run in NHWC (XLA's native TPU layout); the flat observation
    stores the grid in the reference's CHW order, so we reshape then transpose
    once — XLA fuses this into the producing op.
  * Everything is a pure function of (params, obs); no device state.
  * The dueling aggregate Q = V + (A - mean A) and greedy action selection
    have a fused Pallas kernel in ops/pallas/dueling.py; the module exposes
    plain-XLA versions which the agent can swap.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import NetworkSpec

_ACTIVATIONS: dict = {
    "elu": nn.elu,
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
}


def _dtype(spec: NetworkSpec):
    return jnp.dtype(spec.dtype)


class TwoStreamTrunk(nn.Module):
    """CNN-over-grid + macro-vector two-stream trunk.

    Mirrors env/dqn_config.py:66-143: the flat input's first ``macro_len``
    entries are the macro vector; the rest is the (C, H, W) CV grid. The CNN
    is Conv(32,3x3,s1) -> Conv(64,3x3,s(2,1)) -> Conv(64,3x3,s(2,2)), each
    with padding k//2 and ELU, followed by dense layers [512, 256].

    The flattened CNN features are emitted in the reference's (C, H, W)
    index order so that dense-layer weights are interchangeable with the
    PyTorch checkpoints (models/packio.py relies on this).
    """

    spec: NetworkSpec

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        spec = self.spec
        dt = _dtype(spec)
        c, h, w = spec.micro_shape_chw
        macro = x[:, : spec.macro_len].astype(dt)
        micro = x[:, spec.macro_len :].reshape(-1, c, h, w)
        # NCHW (storage order) -> NHWC (TPU conv layout)
        micro = jnp.transpose(micro, (0, 2, 3, 1)).astype(dt)

        act = _ACTIVATIONS[spec.activation]
        for i, (f, k, s) in enumerate(
            zip(spec.cnn_filters, spec.cnn_kernels, spec.cnn_strides)
        ):
            pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))
            micro = nn.Conv(
                features=f,
                kernel_size=tuple(k),
                strides=tuple(s),
                padding=pad,
                dtype=dt,
                name=f"conv_{i}",
            )(micro)
            micro = act(micro)

        # Flatten in CHW order for checkpoint parity with the reference's
        # torch .flatten(start_dim=1) on NCHW tensors.
        micro = jnp.transpose(micro, (0, 3, 1, 2))  # NHWC -> NCHW
        micro_flat = micro.reshape(micro.shape[0], -1)

        feat = jnp.concatenate([micro_flat, macro], axis=1)
        for i, width in enumerate(spec.dense):
            feat = nn.Dense(width, dtype=dt, name=f"dense_{i}")(feat)
            feat = act(feat)
        return feat


class MLPTrunk(nn.Module):
    """Plain MLP trunk for the macro-only state variants."""

    spec: NetworkSpec

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = _dtype(self.spec)
        act = _ACTIVATIONS[self.spec.activation]
        feat = x.astype(dt)
        for i, width in enumerate(self.spec.mlp_hidden):
            feat = nn.Dense(width, dtype=dt, name=f"dense_{i}")(feat)
            feat = act(feat)
        return feat


def _make_trunk(spec: NetworkSpec) -> nn.Module:
    if spec.kind == "two_stream_hybrid":
        return TwoStreamTrunk(spec)
    if spec.kind == "mlp":
        return MLPTrunk(spec)
    raise ValueError(f"unknown network kind: {spec.kind}")


class NoisyDense(nn.Module):
    """Factorized-Gaussian NoisyNet layer (Fortunato et al. 2018, §3).

    w = mu_w + sigma_w * (f(eps_in) f(eps_out)^T), f(e) = sign(e)sqrt(|e|),
    one (eps_in, eps_out) pair per forward via the 'noise' rng collection.
    WITHOUT a 'noise' rng the layer applies the MEAN weights — that makes
    greedy eval deterministic and keeps .pack interop: mu keeps the plain
    kernel/bias param names (sigma rides alongside as kernel_sigma/
    bias_sigma), so every existing consumer of params['fc_adv']['kernel']
    (incl. the Pallas dueling kernel) sees the mean policy unchanged."""

    features: int
    sigma0: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        bound = 1.0 / (in_f ** 0.5)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (in_f, self.features))
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,))
        sigma_init = nn.initializers.constant(self.sigma0 / (in_f ** 0.5))
        kernel_sigma = self.param("kernel_sigma", sigma_init,
                                  (in_f, self.features))
        bias_sigma = self.param("bias_sigma", sigma_init, (self.features,))
        if self.has_rng("noise"):
            k_in, k_out = jax.random.split(self.make_rng("noise"))

            def f(e):
                return jnp.sign(e) * jnp.sqrt(jnp.abs(e))

            eps_in = f(jax.random.normal(k_in, (in_f,)))
            eps_out = f(jax.random.normal(k_out, (self.features,)))
            kernel = kernel + kernel_sigma * (eps_in[:, None] * eps_out[None, :])
            bias = bias + bias_sigma * eps_out
        return (x.astype(self.dtype) @ kernel.astype(self.dtype)
                + bias.astype(self.dtype))


class QNetwork(nn.Module):
    """Single-head Q-network (reference DeepQNetwork, dqn/network.py:50-74)."""

    spec: NetworkSpec
    n_actions: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feat = _make_trunk(self.spec)(x)
        return nn.Dense(self.n_actions, dtype=_dtype(self.spec), name="fc_out")(feat)

    def greedy(self, x: jax.Array) -> jax.Array:
        return jnp.argmax(self(x), axis=-1)


class DuelingQNetwork(nn.Module):
    """Dueling Q-network (reference DuelingDeepQNetwork, dqn/network.py:77-117).

    ``__call__`` returns aggregated Q = V + (A - mean A); ``advantages``
    returns the advantage head only. Greedy actions argmax advantages —
    matching the reference's ``actions()`` which skips the value head
    (network.py:110-117).
    """

    spec: NetworkSpec
    n_actions: int

    def setup(self):
        self.trunk = _make_trunk(self.spec)
        dt = _dtype(self.spec)
        if self.spec.noisy:
            self.fc_val = NoisyDense(1, self.spec.noisy_sigma0, dt,
                                     name="fc_val")
            self.fc_adv = NoisyDense(self.n_actions, self.spec.noisy_sigma0,
                                     dt, name="fc_adv")
        else:
            self.fc_val = nn.Dense(1, dtype=dt, name="fc_val")
            self.fc_adv = nn.Dense(self.n_actions, dtype=dt, name="fc_adv")

    def __call__(self, x: jax.Array) -> jax.Array:
        feat = self.trunk(x)
        val = self.fc_val(feat)
        adv = self.fc_adv(feat)
        return val + adv - jnp.mean(adv, axis=-1, keepdims=True)

    def advantages(self, x: jax.Array) -> jax.Array:
        return self.fc_adv(self.trunk(x))

    def greedy(self, x: jax.Array) -> jax.Array:
        return jnp.argmax(self.advantages(x), axis=-1)


def _make_dist_heads(mod: nn.Module) -> None:
    """Build the distributional output heads on ``mod`` (C51/QR networks):
    K-atom value head + A*K-atom advantage head when dueling, else one
    A*K head. With ``spec.noisy`` the heads are NoisyDense (full-Rainbow
    composition, Hessel et al. 2018 — noisy exploration over a
    distributional head); without a 'noise' rng they apply mean weights,
    so greedy eval and .pack interop are unchanged."""
    spec, dt, k = mod.spec, _dtype(mod.spec), mod.spec.n_atoms
    if spec.noisy:
        dense = lambda f, name: NoisyDense(f, spec.noisy_sigma0, dt, name=name)
    else:
        dense = lambda f, name: nn.Dense(f, dtype=dt, name=name)
    if spec.dueling:
        mod.fc_val = dense(k, "fc_val")
        mod.fc_adv = dense(mod.n_actions * k, "fc_adv")
    else:
        mod.fc_out = dense(mod.n_actions * k, "fc_out")


class DistributionalQNetwork(nn.Module):
    """C51 categorical head (TPU-build extension; Bellemare et al. 2017).

    ``logits`` returns [B, A, n_atoms]; with ``spec.dueling`` the value and
    advantage streams each emit atom logits and aggregate in logit space
    (Rainbow-style): l = v + a - mean_a(a). ``__call__`` returns expected
    Q-values [B, A] under softmax(logits) on the fixed support, so greedy
    action selection and eval tooling see the familiar scalar-Q surface.
    """

    spec: NetworkSpec
    n_actions: int

    def setup(self):
        self.trunk = _make_trunk(self.spec)
        _make_dist_heads(self)

    def support(self) -> jax.Array:
        return jnp.linspace(self.spec.v_min, self.spec.v_max,
                            self.spec.n_atoms)

    def logits(self, x: jax.Array) -> jax.Array:
        feat = self.trunk(x)
        k = self.spec.n_atoms
        if self.spec.dueling:
            val = self.fc_val(feat)[:, None, :]                    # [B,1,K]
            adv = self.fc_adv(feat).reshape(-1, self.n_actions, k)  # [B,A,K]
            return val + adv - jnp.mean(adv, axis=1, keepdims=True)
        return self.fc_out(feat).reshape(-1, self.n_actions, k)

    def probs(self, x: jax.Array) -> jax.Array:
        return jax.nn.softmax(self.logits(x), axis=-1)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.sum(self.probs(x) * self.support(), axis=-1)

    def greedy(self, x: jax.Array) -> jax.Array:
        return jnp.argmax(self(x), axis=-1)


class QuantileQNetwork(nn.Module):
    """QR-DQN head (TPU-build extension; Dabney et al. 2017).

    ``quantiles`` returns [B, A, N] quantile VALUES at the fixed midpoint
    fractions tau_i = (2i+1)/2N — no support bounds to calibrate (the
    failure mode of the C51 head on this domain). Dueling aggregation runs
    on the quantile values; ``__call__`` returns mean-over-quantiles
    Q-values [B, A] so greedy selection and eval tooling see the scalar-Q
    surface.
    """

    spec: NetworkSpec
    n_actions: int

    def setup(self):
        self.trunk = _make_trunk(self.spec)
        _make_dist_heads(self)

    def taus(self) -> jax.Array:
        k = self.spec.n_atoms
        return (2.0 * jnp.arange(k) + 1.0) / (2.0 * k)

    def quantiles(self, x: jax.Array) -> jax.Array:
        feat = self.trunk(x)
        k = self.spec.n_atoms
        if self.spec.dueling:
            val = self.fc_val(feat)[:, None, :]                     # [B,1,K]
            adv = self.fc_adv(feat).reshape(-1, self.n_actions, k)  # [B,A,K]
            return val + adv - jnp.mean(adv, axis=1, keepdims=True)
        return self.fc_out(feat).reshape(-1, self.n_actions, k)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.mean(self.quantiles(x), axis=-1)

    def greedy(self, x: jax.Array) -> jax.Array:
        return jnp.argmax(self(x), axis=-1)


class IqnQNetwork(nn.Module):
    """IQN head (TPU-build extension; Dabney et al. 2018 — implicit
    quantile networks).

    Quantile fractions are INPUTS, not fixed: ``quantiles_at(x, taus)``
    embeds each tau with n cosine features phi_j(tau) = relu(W cos(pi j
    tau) + b) (paper eq. 4), modulates the trunk features by elementwise
    product, and maps through the dueling heads — so the same parameters
    evaluate ANY quantile. The loss samples fresh taus per update
    (ops/losses.py iqn_loss); eval surfaces (``quantiles``/``__call__``/
    ``greedy``) use the fixed midpoint grid tau_i = (2i+1)/2K for
    determinism, K = spec.n_atoms. All-dense (MXU-friendly batched
    matmuls over the [B, K, F] tau axis), .pack round-trips via the
    ``tau_embed`` layer entry in packio._torch_keys.
    """

    spec: NetworkSpec
    n_actions: int

    def setup(self):
        self.trunk = _make_trunk(self.spec)
        dt = _dtype(self.spec)
        feat = (self.spec.dense[-1] if self.spec.kind == "two_stream_hybrid"
                else self.spec.mlp_hidden[-1])
        # tau_embed stays a plain Dense even under spec.noisy: the cosine
        # embedding is shared deterministic structure; the Rainbow noisy
        # composition perturbs the OUTPUT heads (mirrors _make_dist_heads).
        self.tau_embed = nn.Dense(feat, dtype=dt, name="tau_embed")
        if self.spec.noisy:
            dense = lambda f, name: NoisyDense(f, self.spec.noisy_sigma0,
                                               dt, name=name)
        else:
            dense = lambda f, name: nn.Dense(f, dtype=dt, name=name)
        if self.spec.dueling:
            self.fc_val = dense(1, "fc_val")
            self.fc_adv = dense(self.n_actions, "fc_adv")
        else:
            self.fc_out = dense(self.n_actions, "fc_out")

    def quantiles_at(self, x: jax.Array, taus: jax.Array) -> jax.Array:
        """x [B, D], taus [B, K] -> quantile values [B, A, K]."""
        psi = self.trunk(x)                                      # [B, F]
        j = jnp.arange(self.spec.iqn_embed_dim, dtype=psi.dtype)
        cosf = jnp.cos(jnp.pi * j[None, None, :]
                       * taus[:, :, None].astype(psi.dtype))     # [B, K, n]
        phi = jax.nn.relu(self.tau_embed(cosf))                  # [B, K, F]
        z = psi[:, None, :] * phi                                # [B, K, F]
        if self.spec.dueling:
            val = self.fc_val(z)                                 # [B, K, 1]
            adv = self.fc_adv(z)                                 # [B, K, A]
            q = val + adv - jnp.mean(adv, axis=-1, keepdims=True)
        else:
            q = self.fc_out(z)
        return jnp.transpose(q, (0, 2, 1))                       # [B, A, K]

    def taus(self) -> jax.Array:
        k = self.spec.n_atoms
        return (2.0 * jnp.arange(k) + 1.0) / (2.0 * k)

    def quantiles(self, x: jax.Array) -> jax.Array:
        """Fixed-midpoint-grid quantiles [B, A, K] (deterministic eval)."""
        t = jnp.broadcast_to(self.taus()[None, :],
                             (x.shape[0], self.spec.n_atoms))
        return self.quantiles_at(x, t)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.mean(self.quantiles(x), axis=-1)

    def greedy(self, x: jax.Array) -> jax.Array:
        return jnp.argmax(self(x), axis=-1)


def build_network(spec: NetworkSpec, n_actions: int) -> nn.Module:
    if spec.n_atoms > 1:
        cls = {"qr": QuantileQNetwork, "iqn": IqnQNetwork}.get(
            spec.dist_kind, DistributionalQNetwork)
        return cls(spec, n_actions)
    return (DuelingQNetwork if spec.dueling else QNetwork)(spec, n_actions)


def init_params(net: nn.Module, obs_size: int, rng: jax.Array):
    dummy = jnp.zeros((1, obs_size), jnp.float32)
    return net.init(rng, dummy)


_PALLAS_GREEDY_CHOICE: dict = {}


def use_pallas_greedy() -> bool:
    """Fuse the dueling advantage matmul + masked argmax into one Pallas
    kernel on the TPU action path (ops/pallas/dueling.py; both paths agree
    bit-for-bit, tests/test_pallas.py / test_networks.py). Override with
    MDRLRMC_PALLAS_GREEDY=0/1."""
    if "v" not in _PALLAS_GREEDY_CHOICE:
        import os

        env = os.environ.get("MDRLRMC_PALLAS_GREEDY")
        if env is not None:
            _PALLAS_GREEDY_CHOICE["v"] = env not in ("0", "false", "")
        else:
            _PALLAS_GREEDY_CHOICE["v"] = jax.default_backend() not in ("cpu",)
    return _PALLAS_GREEDY_CHOICE["v"]


def greedy_fn(net: nn.Module) -> Callable:
    """Returns a pure (params, obs[B, D]) -> actions[B] function.

    Greedy = argmax over ADVANTAGES for dueling heads (reference
    DuelingDeepQNetwork.actions, network.py:110-117); on TPU the advantage
    head + argmax run as the fused Pallas kernel (use_pallas_greedy)."""

    if isinstance(net, DuelingQNetwork):
        if use_pallas_greedy():
            from ..ops.pallas.dueling import dueling_greedy_actions

            interpret = jax.default_backend() == "cpu"

            def fn(params, obs):
                feat = net.apply(params, obs,
                                 method=lambda m, x: m.trunk(x))
                adv = params["params"]["fc_adv"]
                return dueling_greedy_actions(feat, adv["kernel"],
                                              adv["bias"],
                                              interpret=interpret)
        else:
            def fn(params, obs):
                return jnp.argmax(
                    net.apply(params, obs, method=net.advantages), axis=-1)
    else:
        # QNetwork and DistributionalQNetwork: __call__ is (expected) Q.
        def fn(params, obs):
            return jnp.argmax(net.apply(params, obs), axis=-1)
    return fn
