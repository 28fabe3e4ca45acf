"""DeepACO-TPU: a TPU-native neural-enhanced Ant Colony Optimization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of henry-yeh/DeepACO
(reference layout: 13 per-problem torch pipelines; see /root/reference). This
framework factors those capabilities into real layers:

- ``core``     — regular ``[N, K]`` sparse graph representation + instance generators
- ``models``   — Flax GNN / transformer heuristic networks (+ torch checkpoint compat)
- ``aco``      — ONE vectorized rollout engine (lax.scan over steps, vmap over
                 ants x instances) with per-problem plug-ins
- ``ls``       — local search tier: on-device batched 2-opt / NLS, C++ CVRP
                 local search (SWAP* + RI) behind an FFI
- ``train``    — REINFORCE drivers, optax optimizers, typed config
- ``eval``     — the anytime-quality evaluation protocol
- ``parallel`` — device-mesh sharding (instances x ants axes) via shard_map/pjit
- ``ops``      — Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
