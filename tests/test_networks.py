"""Network architecture shape/semantics tests, incl. parity with the torch
reference architecture (env/dqn_config.py:66-143, dqn/network.py:50-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import NetworkSpec, network_spec_for_variant
from multimodal_drl_rmc_tpu.models.networks import (
    DuelingQNetwork,
    QNetwork,
    build_network,
    greedy_fn,
    init_params,
)

OBS_HYBRID = 14 + 2 * 27 * 5


@pytest.fixture(scope="module")
def hybrid_net_params():
    net = build_network(NetworkSpec(), n_actions=8)
    params = init_params(net, OBS_HYBRID, jax.random.PRNGKey(0))
    return net, params


def test_hybrid_output_shape(hybrid_net_params):
    net, params = hybrid_net_params
    x = jnp.zeros((3, OBS_HYBRID))
    q = net.apply(params, x)
    assert q.shape == (3, 8)


def test_cnn_feature_size_matches_torch():
    # Torch conv output for (2,27,5) with the reference stack is (64,7,3)
    # -> flat 1344, +14 macro = 1358 into dense.
    net = build_network(NetworkSpec(), n_actions=8)
    params = init_params(net, OBS_HYBRID, jax.random.PRNGKey(0))
    d0_kernel = params["params"]["trunk"]["dense_0"]["kernel"]
    assert d0_kernel.shape == (64 * 7 * 3 + 14, 512)


def test_dueling_aggregation_identity():
    """Q = V + A - mean(A): mean over actions of Q equals V."""
    net = build_network(NetworkSpec(), n_actions=8)
    params = init_params(net, OBS_HYBRID, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, OBS_HYBRID))
    q = net.apply(params, x)
    adv = net.apply(params, x, method=net.advantages)
    # mean_a Q = V  and  Q - mean(Q) = A - mean(A)
    np.testing.assert_allclose(
        np.asarray(q - q.mean(-1, keepdims=True)),
        np.asarray(adv - adv.mean(-1, keepdims=True)),
        atol=1e-5,
    )


def test_greedy_uses_advantages(hybrid_net_params):
    net, params = hybrid_net_params
    x = jax.random.uniform(jax.random.PRNGKey(3), (5, OBS_HYBRID))
    a = greedy_fn(net)(params, x)
    adv = net.apply(params, x, method=net.advantages)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(jnp.argmax(adv, -1)))


def test_mlp_variants():
    for variant, dim in [("macro_lane", 14), ("macro_no_lane", 8)]:
        spec = network_spec_for_variant(variant)
        net = build_network(spec, n_actions=8)
        params = init_params(net, dim, jax.random.PRNGKey(0))
        q = net.apply(params, jnp.zeros((2, dim)))
        assert q.shape == (2, 8)


def test_non_dueling_head():
    spec = NetworkSpec(kind="mlp", dueling=False)
    net = build_network(spec, n_actions=8)
    assert isinstance(net, QNetwork)
    params = init_params(net, 14, jax.random.PRNGKey(0))
    q = net.apply(params, jnp.zeros((2, 14)))
    assert q.shape == (2, 8)


def test_hybrid_forward_matches_torch_reference_architecture():
    """Bit-for-bit parity: build the same architecture in torch (CPU), copy
    weights both ways through the packio layout, compare outputs."""
    torch = pytest.importorskip("torch")
    from multimodal_drl_rmc_tpu.models import packio

    net = build_network(NetworkSpec(), n_actions=8)
    params = init_params(net, OBS_HYBRID, jax.random.PRNGKey(7))

    tnet = packio.build_torch_twin(NetworkSpec(), n_actions=8)
    packio.load_torch_from_params(tnet, params, NetworkSpec())

    x = np.random.default_rng(0).uniform(size=(4, OBS_HYBRID)).astype(np.float32)
    q_jax = np.asarray(net.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        q_torch = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(q_jax, q_torch, atol=2e-5)


def test_greedy_fn_pallas_gate_matches_argmax():
    """The production action path with the Pallas dueling kernel gated ON
    (interpret mode on CPU) picks exactly the actions the plain
    advantage-argmax picks — same (params, obs) signature, drop-in."""
    import jax

    from multimodal_drl_rmc_tpu.config import NetworkSpec
    from multimodal_drl_rmc_tpu.models import networks as N

    spec = NetworkSpec()          # hybrid dueling trunk
    net = N.build_network(spec, 8)
    params = N.init_params(net, 284, jax.random.PRNGKey(0))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (64, 284))

    old = dict(N._PALLAS_GREEDY_CHOICE)
    try:
        N._PALLAS_GREEDY_CHOICE.clear()
        N._PALLAS_GREEDY_CHOICE["v"] = False
        ref_actions = N.greedy_fn(net)(params, obs)
        N._PALLAS_GREEDY_CHOICE["v"] = True
        fused_actions = N.greedy_fn(net)(params, obs)
    finally:
        N._PALLAS_GREEDY_CHOICE.clear()
        N._PALLAS_GREEDY_CHOICE.update(old)
    np.testing.assert_array_equal(np.asarray(ref_actions),
                                  np.asarray(fused_actions))
