"""Microbench: tiled 2-opt per-move cost (run when TPU is free)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, numpy as np, jax.numpy as jnp
from deepaco_tpu.ops.pallas_two_opt import _tiled_two_opt_call
rng = np.random.default_rng(3)
n = 1280
coords = jnp.asarray(rng.random((n,2)), jnp.float32)
tours = jnp.asarray(np.stack([rng.permutation(n) for _ in range(2)]), jnp.int32)
for iters in (50, 100, 200):
    np.asarray(_tiled_two_opt_call(coords, tours, iters))      # compile
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        np.asarray(_tiled_two_opt_call(coords, tours, iters))
        times.append(time.perf_counter() - t0)
    print(f"iters={iters}: {min(times):.2f}s best of 3 "
          f"({min(times)/(2*iters)*1e3:.1f} ms/ant-move)", flush=True)
