"""Checkpoint interop: .pack round-trip + loading real reference checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import NetworkSpec, network_spec_for_variant
from multimodal_drl_rmc_tpu.models import packio
from multimodal_drl_rmc_tpu.models.networks import build_network, init_params

OBS_HYBRID = 14 + 2 * 27 * 5

REFERENCE_PACK = "/root/reference/save/1ramp_1x3/DuelingDoubleDQNAgent_lr0.0001_model.pack"


def test_pack_roundtrip(tmp_path):
    spec = NetworkSpec()
    net = build_network(spec, 8)
    params = init_params(net, OBS_HYBRID, jax.random.PRNGKey(0))
    path = str(tmp_path / "DuelingDoubleDQNAgent_lr0.0001_model.pack")
    packio.save_pack(path, params, spec, step=123, episode_count=4,
                     rew_mean=-5.5, len_mean=90.0)
    loaded, meta = packio.load_pack(path, spec)
    assert meta == {"step": 123, "episode_count": 4, "rew_mean": -5.5, "len_mean": 90.0}
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, OBS_HYBRID))
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x)), np.asarray(net.apply(loaded, x)), atol=1e-6
    )


def test_parse_pack_filename():
    assert packio.parse_pack_filename("a/b/DuelingDoubleDQNAgent_lr0.0001_model.pack") == (
        "DuelingDoubleDQNAgent", 0.0001,
    )
    assert packio.parse_pack_filename("PerDuelingDoubleDQNAgent_lr1e-05_model.pack") == (
        "PerDuelingDoubleDQNAgent", 1e-05,
    )


@pytest.mark.skipif(not os.path.exists(REFERENCE_PACK), reason="reference pack absent")
def test_load_reference_hybrid_checkpoint():
    """The trained reference model must load and produce finite Q-values with
    the documented metadata (step=2.1e6). Torch twin cross-check guarantees
    the conv/dense layout transposes are right."""
    spec = NetworkSpec()
    net = build_network(spec, 8)
    params, meta = packio.load_pack(REFERENCE_PACK, spec)
    assert meta["step"] == 2_100_000

    x = np.random.default_rng(3).uniform(size=(5, OBS_HYBRID)).astype(np.float32)
    q = np.asarray(net.apply(params, jnp.asarray(x)))
    assert q.shape == (5, 8) and np.all(np.isfinite(q))

    torch = pytest.importorskip("torch")
    tnet = packio.build_torch_twin(spec, 8)
    packio.load_torch_from_params(tnet, params, spec)
    with torch.no_grad():
        q_t = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(q, q_t, rtol=1e-5, atol=1e-2)


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/env/custom_env/macro with lane/DuelingDoubleDQNAgent_lr0.0001_model_2e6_1e6.pack"
    ),
    reason="reference variant pack absent",
)
def test_load_reference_macro_checkpoint():
    spec = network_spec_for_variant("macro_lane")
    net = build_network(spec, 8)
    params, _ = packio.load_pack(
        "/root/reference/env/custom_env/macro with lane/DuelingDoubleDQNAgent_lr0.0001_model_2e6_1e6.pack",
        spec,
    )
    q = net.apply(params, jnp.ones((1, 14)))
    assert q.shape == (1, 8) and bool(jnp.all(jnp.isfinite(q)))
