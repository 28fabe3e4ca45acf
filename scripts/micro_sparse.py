#!/usr/bin/env python
"""Microbenchmarks for the sparse sweep's per-step pieces on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

B, N, K, A, T = 100, 500, 50, 20, 499


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    score_s = jax.device_put(jax.random.normal(key, (B, N, K)))
    score_d = jax.device_put(jax.random.normal(key, (B, N, N)))
    nbr = jax.device_put(
        jax.random.randint(key, (B, N, K), 0, N, dtype=jnp.int32))
    cur0 = jnp.zeros((B, A), jnp.int32)
    words0 = jnp.zeros((B, A, 16), jnp.uint32)

    def timeit(label, fn, *args, reps=3):
        jax.block_until_ready(fn(*args))
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:32s} {dt*1e3:9.1f} ms   ({dt/T*1e6:7.1f} us/step)")
        return dt

    def scan_of(step):
        @jax.jit
        def run(cur, words, rng):
            keys = jax.random.split(rng, T)
            (cur, words), ys = jax.lax.scan(
                lambda c, k: step(c, k), (cur, words), keys)
            return ys

        return run

    # 1. gather rows via vmap-index
    def step_gather_vmap(carry, k):
        cur, words = carry
        rows = jax.vmap(lambda t, i: t[i])(score_s, cur)
        a = jnp.argmax(rows, -1).astype(jnp.int32)
        cur = (cur + a) % N
        return (cur, words), a[..., 0]

    # 2. gather rows via take_along_axis on axis 1
    def step_gather_taa(carry, k):
        cur, words = carry
        rows = jnp.take_along_axis(score_s, cur[:, :, None], axis=1)
        a = jnp.argmax(rows, -1).astype(jnp.int32)
        cur = (cur + a) % N
        return (cur, words), a[..., 0]

    # 3. full sparse step (no cond/fallback)
    def step_sparse(carry, k):
        cur, words = carry
        nbr_rows = jnp.take_along_axis(nbr, cur[:, :, None], axis=1)
        wvals = jnp.take_along_axis(words, nbr_rows >> 5, axis=2)
        vis = (wvals >> (nbr_rows & 31).astype(jnp.uint32)) & 1
        rows = jnp.take_along_axis(score_s, cur[:, :, None], axis=1)
        logits = jnp.where(vis == 0, rows, -1e30)
        g = jax.random.gumbel(k, logits.shape)
        slot = jnp.argmax(logits + g, -1)
        action = jnp.take_along_axis(nbr_rows, slot[..., None], -1)[..., 0]
        aw = (action >> 5)[..., None]
        bit = jnp.left_shift(jnp.uint32(1),
                             (action & 31)[..., None].astype(jnp.uint32))
        w_iota = jnp.arange(16, dtype=jnp.int32)
        words = jnp.where(w_iota == aw, words | bit, words)
        return (cur * 0 + action % N, words), action[..., 0]

    # 4. dense gather row step (old-style cost)
    def step_dense(carry, k):
        cur, words = carry
        rows = jnp.take_along_axis(score_d, cur[:, :, None], axis=1)
        g = jax.random.gumbel(k, rows.shape)
        a = jnp.argmax(rows + g, -1).astype(jnp.int32)
        return (a, words), a[..., 0]

    # 5. flat-table gather: [B*N, K] with linearized indices
    score_flat = score_s.reshape(B * N, K)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]

    def step_gather_flat(carry, k):
        cur, words = carry
        rows = score_flat[(base + cur).reshape(-1)].reshape(B, A, K)
        a = jnp.argmax(rows, -1).astype(jnp.int32)
        cur = (cur + a) % N
        return (cur, words), a[..., 0]

    # 6. flat dense gather: [B*N, N]
    dense_flat = score_d.reshape(B * N, N)

    def step_dense_flat(carry, k):
        cur, words = carry
        rows = dense_flat[(base + cur).reshape(-1)].reshape(B, A, N)
        g = jax.random.gumbel(k, rows.shape)
        a = jnp.argmax(rows + g, -1).astype(jnp.int32)
        return (a, words), a[..., 0]

    # 7. flat sparse full step: everything gather-free except one flat gather
    nbr_flat = nbr.reshape(B * N, K)

    def step_sparse_flat(carry, k):
        cur, words = carry
        lin = (base + cur).reshape(-1)
        rows = score_flat[lin].reshape(B, A, K)
        nbr_rows = nbr_flat[lin].reshape(B, A, K)
        # visited-bit test: unrolled select over the 16 words (gather-free)
        vis = jnp.zeros((B, A, K), jnp.uint32)
        wsel = nbr_rows >> 5
        bsel = (nbr_rows & 31).astype(jnp.uint32)
        for w in range(16):
            vis = vis | jnp.where(wsel == w,
                                  (words[:, :, w:w + 1] >> bsel) & 1, 0)
        logits = jnp.where(vis == 0, rows, -1e30)
        g = jax.random.gumbel(k, logits.shape)
        noisy = logits + g
        slot = jnp.argmax(noisy, -1)
        action = jnp.sum(
            jnp.where(jnp.arange(K) == slot[..., None], nbr_rows, 0), -1)
        aw = (action >> 5)[..., None]
        bit = jnp.left_shift(jnp.uint32(1),
                             (action & 31)[..., None].astype(jnp.uint32))
        w_iota = jnp.arange(16, dtype=jnp.int32)
        words = jnp.where(w_iota == aw, words | bit, words)
        return (action, words), action[..., 0]

    # 8. trivial step: no gather at all — pure scan + small-op overhead
    def step_trivial(carry, k):
        cur, words = carry
        g = jax.random.gumbel(k, (B, A, K))
        a = jnp.argmax(g, -1).astype(jnp.int32)
        return ((cur + a) % N, words), a[..., 0]

    # 9. gather scaling with row count: 10x the ants
    A10 = A * 10
    cur10 = jnp.zeros((B, A10), jnp.int32)

    def step_flat_10x(carry, k):
        cur, words = carry
        rows = score_flat[
            ((jnp.arange(B, dtype=jnp.int32) * N)[:, None] + cur)
            .reshape(-1)].reshape(B, A10, K)
        a = jnp.argmax(rows, -1).astype(jnp.int32)
        return ((cur + a) % N, words), a[..., 0]

    @jax.jit
    def run10(cur, words, rng):
        keys = jax.random.split(rng, T)
        _, ys = jax.lax.scan(lambda c, k: step_flat_10x(c, k),
                             (cur, words), keys)
        return ys

    # 10. pure scan: carry arithmetic only
    def step_pure(carry, k):
        cur, words = carry
        return ((cur + 1) % N, words), cur[..., 0]

    # 11. RNG only (no argmax)
    def step_rng(carry, k):
        cur, words = carry
        g = jax.random.gumbel(k, (B, A, K))
        return ((cur + 1) % N, words), g[..., 0, 0]

    # 12. argmax only over precomputed noise (noise read from closure)
    noise = jax.random.normal(key, (B, A, K))

    def step_argmax(carry, k):
        cur, words = carry
        a = jnp.argmax(noise + cur[..., None].astype(jnp.float32), -1)
        return ((cur + a.astype(jnp.int32)) % N, words), a[..., 0]

    # 13. raw random bits + manual gumbel (skip jax.random key plumbing)
    def step_rawbits(carry, k):
        cur, words = carry
        bits = jax.random.bits(k, (B, A, K), jnp.uint32)
        u = (bits >> 9).astype(jnp.float32) * (2.0 ** -23) + 2.0 ** -24
        g = -jnp.log(-jnp.log(u))
        a = jnp.argmax(g, -1).astype(jnp.int32)
        return ((cur + a) % N, words), a[..., 0]

    timeit("scan: pure carry step", scan_of(step_pure), cur0, words0, key)
    timeit("scan: rng only", scan_of(step_rng), cur0, words0, key)
    timeit("scan: argmax only", scan_of(step_argmax), cur0, words0, key)
    timeit("scan: rawbits gumbel+argmax", scan_of(step_rawbits),
           cur0, words0, key)
    timeit("scan: trivial step (no gather)", scan_of(step_trivial),
           cur0, words0, key)
    timeit("scan: FLAT rows 10x ants", run10, cur10, words0, key)
    timeit("scan: vmap-index rows [B,A,K]", scan_of(step_gather_vmap),
           cur0, words0, key)
    timeit("scan: FLAT rows [B,A,K]", scan_of(step_gather_flat),
           cur0, words0, key)
    timeit("scan: FLAT dense [B,A,N]", scan_of(step_dense_flat),
           cur0, words0, key)
    timeit("scan: FLAT full sparse step", scan_of(step_sparse_flat),
           cur0, words0, key)
    timeit("scan: take_along rows [B,A,K]", scan_of(step_gather_taa),
           cur0, words0, key)
    timeit("scan: full sparse step", scan_of(step_sparse), cur0, words0, key)
    timeit("scan: dense row step [B,A,N]", scan_of(step_dense),
           cur0, words0, key)


if __name__ == "__main__":
    main()
