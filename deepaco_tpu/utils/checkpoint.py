"""Checkpointing: params + optimizer state + batch stats + step + RNG.

The reference only saves ``net.state_dict()`` (tsp/train.ipynb cell 3;
best/last per epoch at tsp_nls/train.py:118-122) and never persists optimizer
state (SURVEY §5 Checkpoint/resume). Here the FULL train state round-trips
through one msgpack file (flax.serialization), so resume is exact.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, template):
    """Restore into a pytree with the same structure as ``template``."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_params_npz(path: str, params) -> None:
    """Flat .npz export of parameters (interchange format)."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        flat[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
