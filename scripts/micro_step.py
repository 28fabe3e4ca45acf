#!/usr/bin/env python
"""Microbench the batched construction step: flat row-gather vs one-hot
MXU matmul row fetch, plus component floors (gumbel, argmax)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

B, N, A, T = 100, 500, 20, 499


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    score = jax.device_put(jax.random.normal(key, (B, N, N), dtype=dt))
    score_flat = score.reshape(B * N, N)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    cols = jnp.arange(N, dtype=jnp.int32)
    cur0 = jnp.zeros((B, A), jnp.int32)
    mask0 = jnp.ones((B, A, N), dt)
    neg = jnp.asarray(-1e30, dt)

    def timeit(label, fn, *args, reps=3):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(*args))
        s = (time.perf_counter() - t0) / reps
        print(f"{label:42s} {s*1e3:8.1f} ms  ({s/T*1e6:6.1f} us/step)")

    def sweep(step):
        @jax.jit
        def run(k):
            keys = jax.random.split(k, T)

            def body(carry, kk):
                cur, mask = carry
                action, mask = step(cur, mask, kk)
                return (action, mask), action[0, 0]

            (_, _), out = jax.lax.scan(body, (cur0, mask0), keys)
            return out.sum()
        return run

    # A. current production step: flat gather
    def step_gather(cur, mask, kk):
        rows = score_flat[(base + cur).reshape(-1)].reshape(B, A, N)
        logits = jnp.where(mask > 0, rows, neg)
        logits = logits + jax.random.gumbel(kk, logits.shape, dtype=dt)
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        mask = jnp.where(cols[None, None, :] == action[..., None],
                         jnp.zeros((), dt), mask)
        return action, mask

    # B. one-hot MXU matmul row fetch
    def step_onehot(cur, mask, kk):
        oh = (cols[None, None, :] == cur[..., None]).astype(dt)   # [B,A,N]
        rows = jnp.einsum("ban,bnm->bam", oh, score,
                          preferred_element_type=jnp.float32).astype(dt)
        logits = jnp.where(mask > 0, rows, neg)
        logits = logits + jax.random.gumbel(kk, logits.shape, dtype=dt)
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        mask = jnp.where(cols[None, None, :] == action[..., None],
                         jnp.zeros((), dt), mask)
        return action, mask

    # C. no row fetch at all (floor: gumbel+argmax+mask)
    def step_norows(cur, mask, kk):
        logits = jnp.where(mask > 0, mask, neg)
        logits = logits + jax.random.gumbel(kk, logits.shape, dtype=dt)
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        mask = jnp.where(cols[None, None, :] == action[..., None],
                         jnp.zeros((), dt), mask)
        return action, mask

    # D. gather only (no gumbel)
    def step_nog(cur, mask, kk):
        rows = score_flat[(base + cur).reshape(-1)].reshape(B, A, N)
        logits = jnp.where(mask > 0, rows, neg)
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        mask = jnp.where(cols[None, None, :] == action[..., None],
                         jnp.zeros((), dt), mask)
        return action, mask

    timeit("A gather+gumbel (current)", sweep(step_gather), key)
    timeit("B one-hot matmul+gumbel", sweep(step_onehot), key)
    timeit("C no-rows floor", sweep(step_norows), key)
    timeit("D gather, no gumbel", sweep(step_nog), key)


if __name__ == "__main__":
    main()
