"""TPU timing: whole-net fused GNN vs the per-layer path at bench shape.

Run from the repo root: python scripts/perf_fused_gnn.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from deepaco_tpu.core.graph import knn_graph
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint
from deepaco_tpu.ops.fused_gnn import net_forward_fast
from deepaco_tpu.utils.datasets import distance_matrix, load_tsp_dataset

N, K, B = 500, 50, 100
CKPT = "/root/reference/pretrained/tsp/tsp500.pt"


def timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    coords = jax.device_put(
        jnp.asarray(load_tsp_dataset(N, "test")[:B], jnp.float32))
    variables = jax.device_put(load_reference_checkpoint(CKPT))
    model = Net(dual_heads=True)

    @jax.jit
    def graphs(cb):
        def per(c):
            dist = distance_matrix(c)
            return knn_graph(c, dist, K)
        return jax.vmap(per)(cb)

    g = graphs(coords)
    g = jax.tree_util.tree_map(jax.device_put, g)

    @jax.jit
    def old_path(x, nbr, edge):
        def per(xg, nb, e):
            out = model.apply(variables, type(g)(x=xg, nbr=nb, edge=e),
                              train=False)
            return out[1]
        return jnp.sum(jax.vmap(per)(x, nbr, edge))

    @jax.jit
    def fast_bf16(x, nbr, edge):
        return jnp.sum(net_forward_fast(variables, x, nbr, edge,
                                        compute_dtype=jnp.bfloat16))

    @jax.jit
    def fast_f32(x, nbr, edge):
        return jnp.sum(net_forward_fast(variables, x, nbr, edge,
                                        compute_dtype=jnp.float32))

    args = (g.x, g.nbr, g.edge)
    t_old = timed(old_path, *args)
    print(f"per-layer fused path : {t_old*1000:9.2f} ms", flush=True)
    t_bf16 = timed(fast_bf16, *args)
    print(f"whole-net bf16       : {t_bf16*1000:9.2f} ms "
          f"({t_old/t_bf16:.1f}x)", flush=True)
    t_f32 = timed(fast_f32, *args)
    print(f"whole-net f32 HIGHEST: {t_f32*1000:9.2f} ms "
          f"({t_old/t_f32:.1f}x)", flush=True)

    # agreement probe
    @jax.jit
    def heu_old(x, nbr, edge):
        def per(xg, nb, e):
            return model.apply(variables, type(g)(x=xg, nbr=nb, edge=e),
                               train=False)[1]
        return jax.vmap(per)(x, nbr, edge)

    @jax.jit
    def heu_new(x, nbr, edge):
        return net_forward_fast(variables, x, nbr, edge,
                                compute_dtype=jnp.bfloat16)

    a = np.asarray(heu_old(*args))
    c = np.asarray(heu_new(*args))
    print(f"bf16 vs fp32: max|d|={np.abs(a-c).max():.4f} "
          f"corr={np.corrcoef(a.ravel(), c.ravel())[0,1]:.6f}")


if __name__ == "__main__":
    main()
