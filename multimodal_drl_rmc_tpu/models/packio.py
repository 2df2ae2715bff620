"""Checkpoint interop with the reference's msgpack ``.pack`` format.

The reference saves ``{'parameters': {torch_state_dict_key: ndarray}, 'step',
'episode_count', 'rew_mean', 'len_mean'}`` via msgpack with the public
msgpack-numpy wire encoding (dqn/network.py:27-47). This module:

  * encodes/decodes that wire format (ndarrays as
    ``{b'nd', b'type', b'kind', b'shape', b'data'}`` maps) without vendoring
    msgpack-numpy;
  * maps between the torch state-dict layout and our Flax param tree —
    conv weights [O, I, kh, kw] <-> [kh, kw, I, O], dense [out, in] <->
    [in, out]. The hybrid trunk flattens CNN features in the torch CHW order
    (models/networks.py TwoStreamTrunk), so dense weights transfer without
    row permutation;
  * can build a torch "twin" module of the same architecture for parity
    tests and CPU baselines (our own construction, mirroring
    env/dqn_config.py:66-143 + dqn/network.py:77-117 behaviorally).

Trained reference checkpoints therefore load directly for eval parity, and
our checkpoints load back into the reference.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import msgpack
import numpy as np

from ..config import NetworkSpec

# ---------------------------------------------------------------------------
# msgpack-numpy wire format
# ---------------------------------------------------------------------------


def _encode_nd(obj):
    if isinstance(obj, np.ndarray):
        return {
            b"nd": True,
            b"type": obj.dtype.str,
            b"kind": b"",
            b"shape": list(obj.shape),
            b"data": obj.tobytes(),
        }
    if isinstance(obj, (np.generic,)):
        return {b"nd": False, b"type": obj.dtype.str, b"data": obj.tobytes()}
    return obj


def _decode_nd(obj):
    if isinstance(obj, dict) and obj.get(b"nd") is True:
        return np.frombuffer(obj[b"data"], dtype=np.dtype(obj[b"type"])).reshape(
            obj[b"shape"]
        )
    if isinstance(obj, dict) and obj.get(b"nd") is False:
        return np.frombuffer(obj[b"data"], dtype=np.dtype(obj[b"type"]))[0]
    return obj


def pack_bytes(payload: Any) -> bytes:
    return msgpack.dumps(payload, default=_encode_nd)


def unpack_bytes(raw: bytes) -> Any:
    return msgpack.loads(raw, object_hook=_decode_nd, strict_map_key=False)


# ---------------------------------------------------------------------------
# torch-layout <-> flax param tree mapping
# ---------------------------------------------------------------------------


def _torch_keys(spec: NetworkSpec, dueling: bool):
    """Yield (torch_key_base, flax_path, kind) for every layer."""
    entries = []
    if spec.kind == "two_stream_hybrid":
        for i in range(len(spec.cnn_filters)):
            entries.append((f"net.cnn_stream.{2 * i}", ("trunk", f"conv_{i}"), "conv"))
        for i in range(len(spec.dense)):
            entries.append((f"net.dense_stream.{2 * i}", ("trunk", f"dense_{i}"), "dense"))
    elif spec.kind == "mlp":
        for i in range(len(spec.mlp_hidden)):
            entries.append((f"net.{2 * i}", ("trunk", f"dense_{i}"), "dense"))
    else:
        raise ValueError(spec.kind)
    if spec.dist_kind == "iqn" and spec.n_atoms > 1:
        # IQN cosine-embedding layer (models/networks.py IqnQNetwork).
        entries.append(("tau_embed", ("tau_embed",), "dense"))
    if dueling:
        entries.append(("fc_val", ("fc_val",), "dense"))
        entries.append(("fc_adv", ("fc_adv",), "dense"))
    else:
        entries.append(("fc_out", ("fc_out",), "dense"))
    return entries


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def params_to_torch_state(params, spec: NetworkSpec, dueling: bool | None = None):
    """Flax param tree -> {torch_key: np.ndarray} in torch layouts."""
    if dueling is None:
        dueling = spec.dueling
    p = params["params"]
    out = {}
    for tkey, fpath, kind in _torch_keys(spec, dueling):
        layer = _get(p, fpath)
        kernel = np.asarray(layer["kernel"], np.float32)
        bias = np.asarray(layer["bias"], np.float32)
        if kind == "conv":
            # [kh, kw, I, O] -> [O, I, kh, kw]
            out[tkey + ".weight"] = np.ascontiguousarray(kernel.transpose(3, 2, 0, 1))
        else:
            # [in, out] -> [out, in]
            out[tkey + ".weight"] = np.ascontiguousarray(kernel.T)
        out[tkey + ".bias"] = bias
        # NoisyNet heads: mu keeps the plain weight/bias keys (a non-noisy
        # reader gets the mean policy); sigma rides alongside.
        if "kernel_sigma" in layer:
            out[tkey + ".weight_sigma"] = np.ascontiguousarray(
                np.asarray(layer["kernel_sigma"], np.float32).T)
            out[tkey + ".bias_sigma"] = np.asarray(
                layer["bias_sigma"], np.float32)
    return out


def torch_state_to_params(state: dict, spec: NetworkSpec, dueling: bool | None = None):
    """{torch_key: ndarray} -> Flax param tree matching models/networks.py."""
    if dueling is None:
        dueling = spec.dueling
    tree: dict = {}
    for tkey, fpath, kind in _torch_keys(spec, dueling):
        w = np.asarray(state[tkey + ".weight"], np.float32)
        b = np.asarray(state[tkey + ".bias"], np.float32)
        kernel = w.transpose(2, 3, 1, 0) if kind == "conv" else w.T
        node = tree
        for p in fpath[:-1]:
            node = node.setdefault(p, {})
        layer = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}
        if tkey + ".weight_sigma" in state:
            layer["kernel_sigma"] = jnp.asarray(
                np.asarray(state[tkey + ".weight_sigma"], np.float32).T)
            layer["bias_sigma"] = jnp.asarray(
                np.asarray(state[tkey + ".bias_sigma"], np.float32))
        node[fpath[-1]] = layer
    return {"params": tree}


# ---------------------------------------------------------------------------
# .pack save / load (reference dqn/network.py:27-47)
# ---------------------------------------------------------------------------


def save_pack(path, params, spec: NetworkSpec, *, step=0, episode_count=0,
              rew_mean=0.0, len_mean=0.0, dueling: bool | None = None):
    payload = {
        "parameters": params_to_torch_state(params, spec, dueling),
        "step": int(step),
        "episode_count": int(episode_count),
        "rew_mean": float(rew_mean),
        "len_mean": float(len_mean),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(pack_bytes(payload))


def load_pack(path, spec: NetworkSpec, dueling: bool | None = None):
    """Returns (flax_params, metadata dict). Accepts reference checkpoints."""
    with open(path, "rb") as f:
        payload = unpack_bytes(f.read())
    params = torch_state_to_params(payload["parameters"], spec, dueling)
    meta = {k: payload[k] for k in ("step", "episode_count", "rew_mean", "len_mean")}
    return params, meta


def peek_head_width(path: str) -> int:
    """Output width of the action head (fc_adv / fc_out) in a .pack —
    torch layout weights are [out, in]. Lets callers infer spec knobs the
    filename convention doesn't carry (e.g. C51 atom count)."""
    with open(path, "rb") as f:
        params = unpack_bytes(f.read())["parameters"]
    for key in ("fc_adv.weight", "fc_out.weight"):
        if key in params:
            return int(params[key].shape[0])
    raise KeyError(f"no action head found in {path}")


def parse_pack_filename(path: str):
    """'<Algo>_lr<lr>_model.pack' -> (algo, lr). The reference encodes the
    algorithm and learning rate in the filename and parses them back at
    inference (observe.py:22-35) — a load-bearing convention we preserve."""
    base = os.path.basename(path).split("_model.pack")[0].split(".pack")[0]
    algo, _, rest = base.partition("_lr")
    lr = float(rest.split("_")[0]) if rest else 1e-4
    return algo, lr


# ---------------------------------------------------------------------------
# torch twin (tests / CPU baseline benchmarking only)
# ---------------------------------------------------------------------------


def build_torch_twin(spec: NetworkSpec, n_actions: int, dueling: bool | None = None):
    """Construct a torch module with the reference's exact architecture.

    Used by parity tests and by bench.py to measure the PyTorch-CPU baseline.
    Module attribute names follow the reference state-dict layout so
    ``load_state_dict`` works with ``params_to_torch_state`` output.
    """
    import torch
    import torch.nn as nn

    if dueling is None:
        dueling = spec.dueling

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            act = {"elu": nn.ELU, "relu": nn.ReLU}[spec.activation]
            if spec.kind == "two_stream_hybrid":
                c, h, w = spec.micro_shape_chw
                layers = []
                in_ch = c
                for f, k, s in zip(spec.cnn_filters, spec.cnn_kernels, spec.cnn_strides):
                    layers += [
                        nn.Conv2d(in_ch, f, tuple(k), tuple(s),
                                  padding=(k[0] // 2, k[1] // 2)),
                        act(),
                    ]
                    in_ch = f
                cnn = nn.Sequential(*layers)
                with torch.no_grad():
                    flat = cnn(torch.zeros(1, c, h, w)).flatten(1).shape[1]
                dense_layers = []
                in_f = flat + spec.macro_len
                for width in spec.dense:
                    dense_layers += [nn.Linear(in_f, width), act()]
                    in_f = width
                self.net = nn.Module()
                self.net.cnn_stream = cnn
                self.net.dense_stream = nn.Sequential(*dense_layers)
                self._hybrid = True
                self._macro_len = spec.macro_len
                self._micro_shape = tuple(spec.micro_shape_chw)
                feat = in_f
            else:
                layers = []
                in_f = spec.macro_len
                for width in spec.mlp_hidden:
                    layers += [nn.Linear(in_f, width), act()]
                    in_f = width
                self.net = nn.Sequential(*layers)
                self._hybrid = False
                feat = in_f
            if dueling:
                self.fc_val = nn.Linear(feat, 1)
                self.fc_adv = nn.Linear(feat, n_actions)
            else:
                self.fc_out = nn.Linear(feat, n_actions)
            self._dueling = dueling

        def trunk(self, x):
            if self._hybrid:
                macro = x[:, : self._macro_len]
                micro = x[:, self._macro_len :].view(-1, *self._micro_shape)
                feat = self.net.cnn_stream(micro).flatten(1)
                feat = torch.cat([feat, macro], dim=1)
                return self.net.dense_stream(feat)
            return self.net(x)

        def forward(self, x):
            feat = self.trunk(x)
            if self._dueling:
                val, adv = self.fc_val(feat), self.fc_adv(feat)
                return val + adv - adv.mean(dim=1, keepdim=True)
            return self.fc_out(feat)

    return Twin()


def load_torch_from_params(tnet, params, spec: NetworkSpec, dueling: bool | None = None):
    import torch

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v).copy())
        for k, v in params_to_torch_state(params, spec, dueling).items()
    }
    tnet.load_state_dict(state)
    return tnet
