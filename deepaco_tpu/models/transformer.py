"""Transformer heuristic model for MKP PH_items (Flax).

Re-implementation of the reference ``TransformerModel``
(mkp_transformer/net.py:9-45): Linear(6→32)·sqrt(32) → 3 post-LN torch-style
TransformerEncoder layers (d=32, 2 heads, ffn 32, relu, dropout 0) →
ParNet(relu) head → ``heu / heu.max()``. Weights load from the reference
checkpoints via :func:`torch_transformer_to_flax`.
"""
from __future__ import annotations

import math
import re
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TorchEncoderLayer(nn.Module):
    """Post-LN torch ``TransformerEncoderLayer`` (activation relu)."""

    d_model: int = 32
    nhead: int = 2
    d_hid: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, h = self.d_model, self.nhead
        hd = d // h
        in_proj_w = self.param("in_proj_w", nn.initializers.xavier_uniform(),
                               (3 * d, d), self.dtype)
        in_proj_b = self.param("in_proj_b", nn.initializers.zeros,
                               (3 * d,), self.dtype)
        qkv = x @ in_proj_w.T + in_proj_b                  # [n, 3d]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n = x.shape[0]
        q = q.reshape(n, h, hd).transpose(1, 0, 2)          # [h, n, hd]
        k = k.reshape(n, h, hd).transpose(1, 0, 2)
        v = v.reshape(n, h, hd).transpose(1, 0, 2)
        scores = jnp.einsum("hid,hjd->hij", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hij,hjd->hid", attn, v)           # [h, n, hd]
        out = out.transpose(1, 0, 2).reshape(n, d)
        out = nn.Dense(d, name="out_proj", dtype=self.dtype)(out)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x + out)
        ff = nn.Dense(self.d_hid, name="linear1", dtype=self.dtype)(x)
        ff = nn.Dense(d, name="linear2", dtype=self.dtype)(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x + ff)


class TransformerModel(nn.Module):
    """(mkp_transformer/net.py:9-45); input ``[n, ntoken_input]`` → heu [n]."""

    ntoken_input: int = 6
    d_model: int = 32
    nhead: int = 2
    d_hid: int = 32
    nlayers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src):
        x = nn.Dense(self.d_model, name="encoder",
                     dtype=self.dtype)(src) * math.sqrt(self.d_model)
        for i in range(self.nlayers):
            x = TorchEncoderLayer(self.d_model, self.nhead, self.d_hid,
                                  name=f"layer_{i}", dtype=self.dtype)(x)
        # ParNet with relu hidden activations (mkp_transformer/net.py:70-76)
        h = x
        for i in range(2):
            h = nn.relu(nn.Dense(32, name=f"head_lin_{i}",
                                 dtype=self.dtype)(h))
        h = jax.nn.sigmoid(nn.Dense(1, name="head_lin_2",
                                    dtype=self.dtype)(h))[:, 0]
        return h / jnp.max(h)


def torch_transformer_to_flax(state_dict) -> dict:
    """Map the reference TransformerModel state_dict onto Flax params."""
    params: dict = {}

    def put(path, arr):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr)

    for key, val in state_dict.items():
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        if key.endswith("_dummy"):
            continue
        if key == "encoder.weight":
            put(("encoder", "kernel"), arr.T); continue
        if key == "encoder.bias":
            put(("encoder", "bias"), arr); continue
        m = re.fullmatch(
            r"transformer_encoder\.layers\.(\d+)\.(.+)", key)
        if m:
            i, rest = m.groups()
            layer = f"layer_{i}"
            if rest == "self_attn.in_proj_weight":
                put((layer, "in_proj_w"), arr)
            elif rest == "self_attn.in_proj_bias":
                put((layer, "in_proj_b"), arr)
            elif rest == "self_attn.out_proj.weight":
                put((layer, "out_proj", "kernel"), arr.T)
            elif rest == "self_attn.out_proj.bias":
                put((layer, "out_proj", "bias"), arr)
            elif rest in ("linear1.weight", "linear2.weight"):
                put((layer, rest.split(".")[0], "kernel"), arr.T)
            elif rest in ("linear1.bias", "linear2.bias"):
                put((layer, rest.split(".")[0], "bias"), arr)
            elif rest == "norm1.weight":
                put((layer, "norm1", "scale"), arr)
            elif rest == "norm1.bias":
                put((layer, "norm1", "bias"), arr)
            elif rest == "norm2.weight":
                put((layer, "norm2", "scale"), arr)
            elif rest == "norm2.bias":
                put((layer, "norm2", "bias"), arr)
            else:
                raise ValueError(f"unrecognized layer key: {key}")
            continue
        m = re.fullmatch(r"decoder_heu\.lins\.(\d+)\.(weight|bias)", key)
        if m:
            i, wb = m.groups()
            if wb == "weight":
                put((f"head_lin_{i}", "kernel"), arr.T)
            else:
                put((f"head_lin_{i}", "bias"), arr)
            continue
        raise ValueError(f"unrecognized checkpoint key: {key}")
    return {"params": params}


def load_transformer_checkpoint(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_transformer_to_flax(sd)
