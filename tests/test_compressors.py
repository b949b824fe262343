"""Compressor comparison tests — partialACA vs fullACA vs SVD, mirroring
tests/functional_tests/hmatrix/lrmat/ and examples/compression_comparison.cpp:
all three must meet the epsilon oracle; SVD is rank-optimal so its ranks
lower-bound the ACA ranks."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.compressors import batched_recompress
from htool_tpu.testing import create_sphere, laplace_kernel, laplace_kernel_symmetric


def rel(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.mark.parametrize("compressor", ["partial_aca", "sym_partial_aca", "full_aca", "svd"])
@pytest.mark.parametrize("epsilon", [1e-3, 1e-6])
def test_compressor_oracle(compressor, epsilon):
    pts = create_sphere(500)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    H = ht.build_hmatrix(gen, tree, epsilon=epsilon, eta=10.0, compressor=compressor)
    A = np.asarray(gen.to_dense())
    assert rel(H.to_dense(), A) < epsilon
    assert ht.hmatrix_info(H)["n_low_rank_blocks"] > 0


def test_svd_ranks_lower_bound_aca():
    pts = create_sphere(500)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    eps = 1e-4
    h_aca = ht.build_hmatrix(gen, tree, epsilon=eps, compressor="partial_aca")
    h_svd = ht.build_hmatrix(gen, tree, epsilon=eps, compressor="svd")
    r_aca = ht.hmatrix_info(h_aca)["rank_mean"]
    r_svd = ht.hmatrix_info(h_svd)["rank_mean"]
    assert r_svd <= r_aca + 0.5  # SVD is optimal (small slack for estimator)


def test_recompression_reduces_rank():
    """SVD recompression truncates overshooting ACA ranks
    (SVD_recompression.hpp oracle: error stays < eps, rank not larger)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    nb, m, n, r = 4, 60, 50, 24
    # random rank-8 blocks stored at inflated rank 24
    U0 = rng.randn(nb, m, 8)
    V0 = rng.randn(nb, 8, n)
    U = np.concatenate([U0, 1e-10 * rng.randn(nb, m, r - 8)], axis=2)
    V = np.concatenate([V0, 1e-10 * rng.randn(nb, r - 8, n)], axis=1)
    ranks = np.full(nb, r)
    U2, V2, r2 = batched_recompress(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(ranks), 1e-6
    )
    A = np.einsum("bmr,brn->bmn", U, V)
    A2 = np.einsum("bmr,brn->bmn", np.asarray(U2), np.asarray(V2))
    assert np.all(np.asarray(r2) <= 9)
    assert rel(A2, A) < 1e-6


def test_reqrank_compressors_agree():
    """Fixed-rank mode across compressors gives comparable error."""
    tp = create_sphere(300, seed=0)
    sp = create_sphere(250, radius=2.0, center=(4.0, 0, 0), seed=1)
    gen = ht.KernelGenerator(laplace_kernel, tp, sp)
    tt = ht.build_cluster_tree(tp, max_leaf_size=40)
    st = ht.build_cluster_tree(sp, max_leaf_size=40)
    A = np.asarray(gen.to_dense())
    errs = {}
    for comp in ["partial_aca", "full_aca", "svd"]:
        H = ht.build_hmatrix(
            gen, tt, st, epsilon=1e-12, eta=100.0, reqrank=6, compressor=comp
        )
        errs[comp] = rel(H.to_dense(), A)
        assert ht.hmatrix_info(H)["rank_max"] <= 6
    # SVD at fixed rank is optimal; ACA within an order of magnitude
    assert errs["svd"] <= errs["partial_aca"] * 1.001
    assert errs["partial_aca"] < 20 * errs["svd"] + 1e-12


def test_sym_partial_aca_transpose_consistency():
    """sympartialACA orientation (sympartialACA.hpp:48-63): blocks (i,j) and
    (j,i) of a symmetric generator use transpose-consistent pivot walks, so
    the full unsymmetric build is EXACTLY symmetric (not just within eps)."""
    pts = create_sphere(600)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    H = ht.build_hmatrix(
        gen, tree, epsilon=1e-4, eta=10.0, compressor="sym_partial_aca"
    )
    A = np.asarray(gen.to_dense())
    Hd = H.to_dense()
    assert rel(Hd, A) < 1e-4
    # transpose consistency: machine-precision symmetric
    assert np.linalg.norm(Hd - Hd.T) / np.linalg.norm(Hd) < 1e-12
    # plain partial ACA walks both triangles row-first -> NOT exactly symmetric
    H2 = ht.build_hmatrix(gen, tree, epsilon=1e-4, eta=10.0, compressor="partial_aca")
    H2d = H2.to_dense()
    assert np.linalg.norm(H2d - H2d.T) / np.linalg.norm(H2d) > 1e-12
