"""Construction-step experiments: row gather vs one-hot MXU gather.

MEASURED (v5e, B=100, A=20, N=500, bf16, relay-amortized over 10 sweeps):
row gather 32.3 us/step; one-hot MXU gather 48.1 us/step (the gather is NOT
the bottleneck — the 7-pass elementwise chain over [B*A, N] temporaries is,
~17 us of pure HBM traffic); scan unroll 4/8 equal, 16+ worse. Conclusion:
the XLA formulation in aco/batched_tsp.py is within ~2x of its bandwidth
floor and further gains need a fused single-pass step kernel with in-kernel
PRNG — parked (the HBM-resident score matrix cannot be row-gathered from
inside a Pallas kernel without per-ant DMAs).
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

    unroll = int(gather.split(":")[1]) if ":" in gather else 8
    gather = gather.split(":")[0]

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
                              step_keys, unroll=unroll)
    return actions


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.default_rng(0)
    score = jnp.asarray(rng.random((B, N, N)), jnp.bfloat16)
    start = jnp.asarray(rng.integers(0, N, (B, A)), jnp.int32)

    # amortize the ~150-300 ms relay dispatch: 10 sweeps inside ONE program
    for mode in ("rows:4", "rows:8", "rows:16", "rows:32"):
        def ten(s, st, k, m=mode):
            def body(carry, kk):
                acts = sweep(s, st, kk, m)
                return carry + jnp.sum(acts), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(k, 10))
            return tot
        fn = jax.jit(ten)
        np.asarray(fn(score, start, jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        for r in range(2):
            np.asarray(fn(score, start, jax.random.PRNGKey(r + 1)))
        dt = (time.perf_counter() - t0) / 2 / 10
        print(f"{mode:7s}: {dt*1000:7.2f} ms/construction "
              f"({dt/(N-1)*1e6:.1f} us/step)", flush=True)


if __name__ == "__main__":
    main()
