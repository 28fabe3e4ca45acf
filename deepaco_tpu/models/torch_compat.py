"""Load reference PyTorch checkpoints (``pretrained/<problem>/*.pt``) into Flax.

The reference ships ~372 KB torch ``state_dict`` files (SURVEY §2 artifacts).
This module maps them onto the Flax ``Net`` variable tree so the pretrained
models run natively on TPU and serve as the numerics oracle: per-layer
activations of our GNN must ``allclose`` the torch net in eval mode
(BASELINE.md "Numerics" target).

Key mapping (torch name → flax path):
  ``emb_net.v_lin0.weight``            → params/emb_net/v_lin0/kernel (transposed)
  ``emb_net.v_lins1.<i>.weight``       → params/emb_net/v_lins1_<i>/kernel
  ``emb_net.v_bns.<i>.module.weight``  → params/emb_net/v_bns_<i>/scale
  ``emb_net.v_bns.<i>.module.running_mean`` → batch_stats/emb_net/v_bns_<i>/mean
  ``par_net_heu.lins.<i>.weight``      → params/par_net_heu/lin_<i>/kernel
  (``_dummy`` / ``num_batches_tracked`` entries are dropped.)

Torch ``nn.Linear`` stores ``weight`` as ``[out, in]``; Flax ``Dense`` kernels
are ``[in, out]`` — hence the transpose.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Mapping[str, Any]) -> dict:
    """Convert a reference ``Net`` state_dict into Flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching
    :class:`deepaco_tpu.models.gnn.Net`. Accepts both the dual-head tsp/rcpsp
    nets and the single-head (heu only) variants; extra heads in the
    checkpoint are loaded if present.
    """
    params: dict = {}
    stats: dict = {}

    for key, val in state_dict.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked" or parts[-1] == "_dummy":
            continue

        if parts[0] == "emb_net":
            # emb_net.{v_lin0,e_lin0}.{weight,bias}
            m = re.fullmatch(r"emb_net\.([ve]_lin0)\.(weight|bias)", key)
            if m:
                name, wb = m.groups()
                if wb == "weight":
                    _set(params, ("emb_net", name, "kernel"), arr.T)
                else:
                    _set(params, ("emb_net", name, "bias"), arr)
                continue
            # emb_net.{v_lins1..4,e_lins0}.{i}.{weight,bias}
            m = re.fullmatch(r"emb_net\.([ve]_lins\d)\.(\d+)\.(weight|bias)", key)
            if m:
                fam, i, wb = m.groups()
                name = f"{fam}_{i}"
                if wb == "weight":
                    _set(params, ("emb_net", name, "kernel"), arr.T)
                else:
                    _set(params, ("emb_net", name, "bias"), arr)
                continue
            # emb_net.{v_bns,e_bns}.{i}.module.{weight,bias,running_mean,running_var}
            m = re.fullmatch(
                r"emb_net\.([ve]_bns)\.(\d+)\.module\.(weight|bias|running_mean|running_var)",
                key)
            if m:
                fam, i, what = m.groups()
                name = f"{fam}_{i}"
                if what == "weight":
                    _set(params, ("emb_net", name, "scale"), arr)
                elif what == "bias":
                    _set(params, ("emb_net", name, "bias"), arr)
                elif what == "running_mean":
                    _set(stats, ("emb_net", name, "mean"), arr)
                else:
                    _set(stats, ("emb_net", name, "var"), arr)
                continue
            raise ValueError(f"unrecognized emb_net key: {key}")

        # par_net_heu.lins.{i}.{weight,bias} (and par_net_phe)
        m = re.fullmatch(r"(par_net_\w+)\.lins\.(\d+)\.(weight|bias)", key)
        if m:
            head, i, wb = m.groups()
            name = f"lin_{i}"
            if wb == "weight":
                _set(params, (head, name, "kernel"), arr.T)
            else:
                _set(params, (head, name, "bias"), arr)
            continue
        if parts[-1] == "_dummy" or key.endswith("._dummy"):
            continue
        raise ValueError(f"unrecognized checkpoint key: {key}")

    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference ``.pt`` checkpoint file into Flax variables (host-side)."""
    import torch  # CPU-only torch, used solely for deserialization

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if any(k.startswith("transformer_encoder") for k in sd):
        # mkp_transformer checkpoints (mkp_transformer/net.py:9-45)
        from deepaco_tpu.models.transformer import torch_transformer_to_flax

        return torch_transformer_to_flax(sd)   # already {"params": ...}
    return torch_state_dict_to_flax(sd)
