"""Whole-net fused GNN kernel vs the reference-parity Net.apply oracle.

Runs in Pallas interpreter mode on CPU (conftest forces JAX_PLATFORMS=cpu).
fp32 compute_dtype must match Net.apply(train=False) to ~1e-5; bfloat16 mode
(the TPU fast path) must agree loosely.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepaco_tpu.core.graph import knn_graph
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint
from deepaco_tpu.ops.fused_gnn import net_forward_fast, whole_net_supported
from deepaco_tpu.utils.datasets import distance_matrix


def _batch(n, b, k, seed=0):
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.random((b, n, 2)), jnp.float32)

    def per(c):
        dist = distance_matrix(c)
        return knn_graph(c, dist, k)

    return jax.vmap(per)(coords)


@pytest.mark.parametrize("ckpt,dual", [
    ("/root/reference/pretrained/tsp/tsp100.pt", True),
    ("/root/reference/pretrained/tsp_nls/tsp100.pt", False),
])
def test_fused_matches_net_fp32(ckpt, dual):
    variables = load_reference_checkpoint(ckpt)
    feats = variables["params"]["emb_net"]["v_lin0"]["kernel"].shape[0]
    n, b, k = 100, 3, 10
    g = _batch(n, b, k)
    x = g.x if feats == 2 else jnp.ones((b, n, 1), jnp.float32)
    model = Net(dual_heads=dual, use_pallas=False)
    ref = jax.vmap(lambda xg, nbr, e: model.apply(
        variables, type(g)(x=xg, nbr=nbr, edge=e), train=False))(
        x, g.nbr, g.edge)
    heads = ("phe", "heu") if dual else ("heu",)
    out = net_forward_fast(variables, x, g.nbr, g.edge, heads=heads,
                           compute_dtype=jnp.float32)
    ref_t = ref if dual else (ref,)
    out_t = out if dual else (out,)
    for r, o in zip(ref_t, out_t):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


def test_fused_bf16_close():
    variables = load_reference_checkpoint(
        "/root/reference/pretrained/tsp/tsp100.pt")
    n, b, k = 100, 2, 10
    g = _batch(n, b, k, seed=1)
    model = Net(dual_heads=True, use_pallas=False)
    ref = jax.vmap(lambda xg, nbr, e: model.apply(
        variables, type(g)(x=xg, nbr=nbr, edge=e), train=False))(
        g.x, g.nbr, g.edge)[1]
    out = net_forward_fast(variables, g.x, g.nbr, g.edge,
                           compute_dtype=jnp.bfloat16)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    # sigmoid outputs in (0,1): bf16 activations drift a little, but the
    # heuristic LANDSCAPE must be preserved (rank correlation per row)
    np.testing.assert_allclose(out_np, ref_np, atol=0.08)
    corr = np.corrcoef(out_np.ravel(), ref_np.ravel())[0, 1]
    assert corr > 0.998
    # the protocol-level quality gate is the on-device A/B in bench.py
    # (cost@T10 fp32 vs bf16 on the tsp500 golden set)


def test_node_update_disabled_variant():
    """SOP/SMTWTP disable the node update (sop/net.py:42)."""
    variables = load_reference_checkpoint(
        "/root/reference/pretrained/smtwtp/smtwtp100.pt")
    feats = variables["params"]["emb_net"]["v_lin0"]["kernel"].shape[0]
    n, b, k = 64, 2, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((b, n, feats)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    edge = jnp.asarray(rng.random((b, n, k, 1)), jnp.float32)
    from deepaco_tpu.core.graph import SparseGraph

    model = Net(dual_heads=False, node_update=False, use_pallas=False)
    ref = jax.vmap(lambda xg, nb, e: model.apply(
        variables, SparseGraph(x=xg, nbr=nb, edge=e), train=False))(
        x, nbr, edge)
    out = net_forward_fast(variables, x, nbr, edge, node_update=False,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_supported_gate():
    assert whole_net_supported(500, 50)
    assert not whole_net_supported(2000, 200)


def test_dense_heuristic_matches_pipeline_fp32():
    """dist -> dense heu kernel vs knn_graph + Net.apply + scatter + fill."""
    from deepaco_tpu.core.graph import scatter_to_dense
    from deepaco_tpu.ops.fused_gnn import (dense_heuristic_supported,
                                           tsp_dense_heuristic)

    variables = load_reference_checkpoint(
        "/root/reference/pretrained/tsp/tsp100.pt")
    n, b, k = 100, 3, 10
    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.random((b, n, 2)), jnp.float32)
    model = Net(dual_heads=True, use_pallas=False)

    def per(c):
        dist = distance_matrix(c)
        g = knn_graph(c, dist, k)
        _, heu = model.apply(variables, g, train=False)
        return scatter_to_dense(g, heu) + 1e-10, dist

    ref, dist = jax.vmap(per)(coords)
    assert dense_heuristic_supported(n, k)
    out = tsp_dense_heuristic(variables, coords, dist, k,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-6)


def test_dense_heuristic_nls_fp32():
    """tsp_nls variant (one-hot start feature, single head): the NLS eval
    path uses the f32 kernel — the tsp_nls checkpoints are bf16-sensitive
    (max sigmoid drift 0.62 measured), while the vanilla nets are not."""
    from deepaco_tpu.ops.fused_gnn import tsp_dense_heuristic
    from deepaco_tpu.core.graph import scatter_to_dense

    variables = load_reference_checkpoint(
        "/root/reference/pretrained/tsp_nls/tsp100.pt")
    n, b, k = 100, 2, 10
    rng = np.random.default_rng(4)
    coords = jnp.asarray(rng.random((b, n, 2)), jnp.float32)
    x = jnp.zeros((b, n, 1), jnp.float32).at[:, 0, 0].set(1.0)
    model = Net(dual_heads=False, use_pallas=False)

    from deepaco_tpu.core.builders import tsp_nls_graph

    def per(c):
        dist = distance_matrix(c)
        g = tsp_nls_graph(c, dist, k, start_node=0)
        heu = model.apply(variables, g, train=False)
        return scatter_to_dense(g, heu) + 1e-10, dist

    ref, dist = jax.vmap(per)(coords)
    out = tsp_dense_heuristic(variables, x, dist, k,
                              compute_dtype=jnp.float32)
    # folded-BN affine reassociation reaches ~1e-4 through this net
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=2e-4)


def test_dense_heuristic_bf16_close():
    from deepaco_tpu.ops.fused_gnn import tsp_dense_heuristic
    from deepaco_tpu.core.graph import scatter_to_dense

    variables = load_reference_checkpoint(
        "/root/reference/pretrained/tsp/tsp100.pt")
    n, b, k = 100, 2, 10
    rng = np.random.default_rng(4)
    coords = jnp.asarray(rng.random((b, n, 2)), jnp.float32)
    model = Net(dual_heads=True, use_pallas=False)

    def per(c):
        dist = distance_matrix(c)
        g = knn_graph(c, dist, k)
        _, heu = model.apply(variables, g, train=False)
        return scatter_to_dense(g, heu) + 1e-10, dist

    ref, dist = jax.vmap(per)(coords)
    out = tsp_dense_heuristic(variables, coords, dist, k,
                              compute_dtype=jnp.bfloat16)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    np.testing.assert_allclose(out_np, ref_np, atol=0.08)
    corr = np.corrcoef(out_np.ravel(), ref_np.ravel())[0, 1]
    assert corr > 0.998
