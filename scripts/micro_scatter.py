#!/usr/bin/env python
"""Microbenchmarks for the pheromone deposit scatter on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

B, N, A, T = 100, 500, 20, 10


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    tau0 = jnp.ones((B, N, N))
    paths = jax.random.randint(key, (B, N, A), 0, N, dtype=jnp.int32)
    amounts = jax.random.uniform(key, (B, A)) + 0.5

    def timeit(label, fn, *args, reps=3):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(*args))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:40s} {dt*1e3:9.1f} ms ({dt/T*1e3:6.1f} ms/iter)")

    def loop(update):
        @jax.jit
        def run(tau, p, am):
            def body(t, _):
                t = update(t, p, am)
                return t * 0.9, t[0, 0, 0]
            t, _ = jax.lax.scan(body, tau, None, length=T)
            return t.sum()
        return run

    # 1. current: vmapped per-instance scatter, two directions
    def upd_vmap(tau, p, am):
        def one(t, pp, aa):
            u = pp.T
            v = jnp.roll(u, 1, axis=1)
            w = jnp.broadcast_to(aa[:, None], u.shape)
            t = t.at[u, v].add(w)
            return t.at[v, u].add(w)
        return jax.vmap(one)(tau, p, am)

    # 2. flat global scatter, two directions merged into one call
    def upd_flat(tau, p, am):
        u = jnp.transpose(p, (0, 2, 1))                    # [B, A, N]
        v = jnp.roll(u, 1, axis=2)
        w = jnp.broadcast_to(am[:, :, None], u.shape)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        flat = tau.reshape(B * N, N)
        rows = jnp.concatenate([(base + u).reshape(-1), (base + v).reshape(-1)])
        cols = jnp.concatenate([v.reshape(-1), u.reshape(-1)])
        ws = jnp.concatenate([w.reshape(-1), w.reshape(-1)])
        flat = flat.at[rows, cols].add(ws)
        return flat.reshape(B, N, N)

    # 3. one-hot segment trick: per (instance, src-row) accumulate over ants
    #    via sorted successor representation — succ[b, a, u] then unroll ants
    def upd_succ(tau, p, am):
        u = jnp.transpose(p, (0, 2, 1))                    # [B, A, N]
        v = jnp.roll(u, 1, axis=2)
        # succ table via scatter of v at column u (per b, a): [B, A, N]
        succ = jnp.zeros((B, A, N), jnp.int32)
        succ = jax.vmap(jax.vmap(lambda s, uu, vv: s.at[uu].set(vv)))(
            succ, u, v)
        cols = jnp.arange(N, dtype=jnp.int32)
        out = tau
        for a_i in range(A):
            onehot = cols[None, None, :] == succ[:, a_i, :, None]
            out = out + jnp.where(onehot, am[:, a_i, None, None], 0.0)
            onehot_t = cols[None, None, :] == succ[:, a_i, :, None]
            # symmetric handled by second pass below
        return out

    timeit("vmapped 2x scatter (current)", loop(upd_vmap),
           tau0, paths, amounts)
    timeit("flat merged 1x scatter", loop(upd_flat), tau0, paths, amounts)

    # 4. scatter only one direction (halve) to see per-element scaling
    def upd_one_dir(tau, p, am):
        def one(t, pp, aa):
            u = pp.T
            v = jnp.roll(u, 1, axis=1)
            w = jnp.broadcast_to(aa[:, None], u.shape)
            return t.at[u, v].add(w)
        return jax.vmap(one)(tau, p, am)

    timeit("vmapped 1-direction scatter", loop(upd_one_dir),
           tau0, paths, amounts)

    # 5. decay only (no scatter): floor cost of the update pass
    def upd_decay(tau, p, am):
        return tau

    timeit("decay only", loop(upd_decay), tau0, paths, amounts)


if __name__ == "__main__":
    main()
