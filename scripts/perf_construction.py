"""Construction-step experiments: row gather vs one-hot MXU gather.

The dense sweep's per-step cost (~29 us at B=100, A=20, N=500) is dominated
by the [B*A] dynamic row gather. This times the alternatives end-to-end.
Run from the repo root when the TPU is free.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from deepaco_tpu.aco.engine import NEG_INF

B, A, N = 100, 20, 500


def sweep(score, start, rng, gather: str):
    b, n, _ = score.shape
    a = start.shape[1]
    dtype = score.dtype
    neg = jnp.asarray(NEG_INF, dtype)
    score_flat = score.reshape(b * n, n)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    cols = jnp.arange(n, dtype=jnp.int32)
    mask0 = jnp.where(cols[None, None, :] == start[..., None],
                      jnp.zeros((), dtype), jnp.ones((), dtype))
    step_keys = jax.random.split(rng, n - 1)

    def step(carry, key):
        cur, mask = carry
        if gather == "rows":
            rows = score_flat[(base + cur).reshape(-1)].reshape(b, a, n)
        else:
            oh = (cols[None, None, :] == cur[..., None]).astype(dtype)
            rows = jax.lax.dot_general(
                oh, score, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype)            # [B, A, N]
        logits = jnp.where(mask > 0, rows, neg)
        logits = logits + jax.random.gumbel(key, logits.shape, dtype=dtype)
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        mask = jnp.where(cols[None, None, :] == action[..., None],
                         jnp.zeros((), dtype), mask)
        return (action, mask), action

    _, actions = jax.lax.scan(step, (start.astype(jnp.int32), mask0),
                              step_keys, unroll=8)
    return actions


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.default_rng(0)
    score = jnp.asarray(rng.random((B, N, N)), jnp.bfloat16)
    start = jnp.asarray(rng.integers(0, N, (B, A)), jnp.int32)

    for mode in ("rows", "onehot"):
        fn = jax.jit(lambda s, st, k, m=mode: sweep(s, st, k, m))
        np.asarray(fn(score, start, jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        for r in range(3):
            np.asarray(fn(score, start, jax.random.PRNGKey(r + 1)))
        dt = (time.perf_counter() - t0) / 3
        print(f"{mode:7s}: {dt*1000:7.2f} ms/construction "
              f"({dt/(N-1)*1e6:.1f} us/step)", flush=True)


if __name__ == "__main__":
    main()
