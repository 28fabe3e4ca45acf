"""Whole-descent Pallas 2-opt / NLS kernel: exact parity with the XLA ops
(interpret mode on the CPU test backend). The XLA ops themselves are parity-
tested against a numpy port of the reference numba kernel in test_two_opt.py,
so equality here chains to reference semantics (tsp_nls/two_opt.py:6-49)."""
import numpy as np

import jax.numpy as jnp

from deepaco_tpu.ops.pallas_two_opt import (
    batched_nls_euclid,
    batched_two_opt_euclid,
    pallas_ls_supported,
)
from deepaco_tpu.ops.two_opt import batched_nls, batched_two_opt, heuristic_dist
from deepaco_tpu.utils.datasets import distance_matrix


def instance(n, seed):
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.random((n, 2)), jnp.float32)
    return coords, distance_matrix(coords)


def random_tours(n, a, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.stack([rng.permutation(n) for _ in range(a)]),
                       jnp.int32)


def test_two_opt_exact_parity_with_xla():
    n = 21  # non-multiple of 128 exercises the padding mask
    coords, dist = instance(n, 0)
    tours = random_tours(n, 4, 1)
    assert pallas_ls_supported(n)
    got = np.asarray(batched_two_opt_euclid(coords, tours, 50))
    want = np.asarray(batched_two_opt(dist, tours, 50))
    np.testing.assert_array_equal(got, want)


def test_two_opt_budget_cap_parity():
    coords, dist = instance(16, 3)
    tours = random_tours(16, 3, 4)
    got = np.asarray(batched_two_opt_euclid(coords, tours, 2))
    want = np.asarray(batched_two_opt(dist, tours, 2))
    np.testing.assert_array_equal(got, want)


def test_nls_parity_with_bf16_metric():
    """The kernel's perturbation metric is deterministically
    ``heu_dist.astype(bfloat16)``; feeding the XLA NLS the same rounded
    metric must give identical tours."""
    n = 18
    coords, dist = instance(n, 5)
    heu = 1.0 / dist
    hd = heuristic_dist(heu)
    tours = random_tours(n, 3, 6)
    got = np.asarray(batched_nls_euclid(coords, hd, tours, 30, 2, 5))
    want = np.asarray(
        batched_nls(dist, hd.astype(jnp.bfloat16).astype(jnp.float32),
                    tours, 30, 2, 5))
    np.testing.assert_array_equal(got, want)
    for a in range(got.shape[0]):
        assert sorted(got[a]) == list(range(n))


def test_support_caps():
    assert pallas_ls_supported(1000)
    assert pallas_ls_supported(2000)          # round-4 tiled NLS kernel
    assert not pallas_ls_supported(2100)      # NLS cap 2048
    assert pallas_ls_supported(4096, "2opt")
    assert not pallas_ls_supported(4200, "2opt")


def test_tiled_nls_parity_multi_tile():
    """The doubly-tiled metric kernel (used for 1024 < n <= 2048) must
    reproduce the XLA NLS with the bf16-rounded metric. Exercised at a
    small multi-tile shape by calling the kernel directly (the public
    wrapper only routes here above n=1024, where interpret mode is slow)."""
    import functools

    import jax
    from jax.experimental import pallas as pl

    from deepaco_tpu.ops import pallas_two_opt as pto

    n, tile = 30, 16
    npad = 32
    coords, dist = instance(n, 9)
    heu = 1.0 / dist
    hd = heuristic_dist(heu)
    tours = random_tours(n, 3, 10)
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(pto._tiled_nls_kernel, n, npad, tile, 40, 2, 5),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tours.shape[0], 1, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((npad // 4, npad), jnp.bfloat16),
                        pltpu.VMEM((8, npad), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=True,
    )(pto._pad_coords(coords, npad),
      pto._pad_square(hd, npad).astype(jnp.bfloat16),
      pto._pad_tours(tours, npad))
    got = np.asarray(out[:, 0, :n])
    want = np.asarray(
        batched_nls(dist, hd.astype(jnp.bfloat16).astype(jnp.float32),
                    tours, 40, 2, 5))
    np.testing.assert_array_equal(got, want)


def test_tiled_nls_routing_above_1024():
    """Public wrapper routes 1024 < n <= 2048 to the tiled NLS kernel and
    matches the XLA path (tiny budgets — interpret mode is slow here)."""
    n = 1100
    coords, dist = instance(n, 7)
    heu = 1.0 / dist
    hd = heuristic_dist(heu)
    tours = random_tours(n, 1, 8)
    got = np.asarray(batched_nls_euclid(coords, hd, tours, 2, 1, 2))
    want = np.asarray(
        batched_nls(dist, hd.astype(jnp.bfloat16).astype(jnp.float32),
                    tours, 2, 1, 2))
    np.testing.assert_array_equal(got, want)


def test_large_instance_falls_back_to_xla():
    n = 4200  # > MAX_NPAD_TILED -> must route to the XLA implementation
    assert not pallas_ls_supported(n, "2opt")
    rng = np.random.default_rng(7)
    coords = jnp.asarray(rng.random((n, 2)), jnp.float32)
    tours = random_tours(n, 1, 8)
    import pytest as _pytest

    with _pytest.warns(UserWarning, match="exceeds the tiled Pallas cap"):
        got = np.asarray(batched_two_opt_euclid(coords, tours, 1))
    want = np.asarray(batched_two_opt(distance_matrix(coords), tours, 1))
    np.testing.assert_array_equal(got, want)
