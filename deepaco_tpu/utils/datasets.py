"""Dataset IO + instance generators.

Two sources of instances:
* the reference's fixed-seed golden datasets (``/root/reference/data/...``,
  torch ``.pt``/pickle files — loaded host-side via CPU torch and converted to
  numpy; BASELINE.md "Golden artifacts"), used for A/B evaluation parity;
* native JAX generators with the same distributions (uniform coords in the
  unit square, etc. — reference tsp/train.ipynb cell 2 ``torch.rand(n, 2)``),
  used for on-device training data.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_DATA = os.environ.get("DEEPACO_REFERENCE_DATA", "/root/reference/data")


# ---------------------------------------------------------------- golden IO --
def load_pt_tensor(path: str) -> np.ndarray:
    """Load a torch-saved tensor (or list of tensors) as numpy, host-side."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, (list, tuple)):
        return np.stack([np.asarray(t) for t in obj])
    return np.asarray(obj)


def load_tsp_dataset(n_node: int, split: str = "test") -> np.ndarray:
    """Reference TSP golden sets: ``data/tsp/{split}Dataset-{n}.pt`` →
    ``[n_instances, n, 2]`` coords (reference tsp/utils.py:38-54)."""
    name = {"test": "testDataset", "val": "valDataset"}[split]
    return load_pt_tensor(os.path.join(REFERENCE_DATA, "tsp", f"{name}-{n_node}.pt"))


# ----------------------------------------------------------- JAX generators --
@functools.partial(jax.jit, static_argnums=1)
def uniform_coords(rng: jax.Array, n: int) -> jax.Array:
    """U(0,1)^2 coordinates — the instance distribution of TSP/CVRP/OP/PCTSP."""
    return jax.random.uniform(rng, (n, 2), jnp.float32)


def distance_matrix(coords: jax.Array, diag: float = 1e9) -> jax.Array:
    """Euclidean distances with a large diagonal sentinel
    (reference tsp/utils.py:4-14 uses 1e9; cvrp uses 1e-10 — pass ``diag``)."""
    d = jnp.sqrt(jnp.sum(
        (coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1) + 1e-20)
    n = coords.shape[0]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, diag, d)
