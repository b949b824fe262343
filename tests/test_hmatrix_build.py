"""H-matrix build tests — dense-oracle pattern of the reference
(tests/functional_tests/hmatrix/test_hmatrix_build.hpp:135-209): assemble,
export to dense, compare against the generator's dense matrix with relative
Frobenius error < epsilon; check compression actually happened."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.testing import (
    create_sphere,
    laplace_kernel,
    laplace_kernel_complex_symmetric,
    laplace_kernel_hermitian,
    laplace_kernel_symmetric,
)


def rel_fro(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.mark.parametrize("epsilon", [1e-3, 1e-6])
@pytest.mark.parametrize("square", [True, False])
def test_build_vs_dense(epsilon, square):
    nt, ns = 500, 500 if square else 400
    tp = create_sphere(nt, seed=0)
    sp = tp if square else create_sphere(ns, radius=2.0, seed=1)
    kern = laplace_kernel_symmetric if square else laplace_kernel
    gen = ht.KernelGenerator(kern, tp, sp)

    tt = ht.build_cluster_tree(tp, max_leaf_size=40)
    st = tt if square else ht.build_cluster_tree(sp, max_leaf_size=40)
    H = ht.build_hmatrix(gen, tt, st, epsilon=epsilon, eta=10.0)

    A = np.asarray(gen.to_dense())
    Ah = H.to_dense()
    assert rel_fro(Ah, A) < epsilon

    info = ht.hmatrix_info(H)
    assert info["n_low_rank_blocks"] > 0
    assert info["compression_ratio"] > 1.0


@pytest.mark.parametrize(
    "kern,symmetry,UPLO",
    [
        (laplace_kernel_symmetric, "S", "L"),
        (laplace_kernel_symmetric, "S", "U"),
        (laplace_kernel_complex_symmetric, "S", "L"),
        (laplace_kernel_hermitian, "H", "L"),
        (laplace_kernel_hermitian, "H", "U"),
    ],
)
def test_build_symmetric(kern, symmetry, UPLO):
    n = 400
    pts = create_sphere(n, seed=0)
    gen = ht.KernelGenerator(kern, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=30)
    eps = 1e-4
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0, symmetry=symmetry, UPLO=UPLO)
    A = np.asarray(gen.to_dense())
    Ah = H.to_dense()
    assert rel_fro(Ah, A) < eps
    # storage must actually be pruned: generated coeffs below full count
    info = ht.hmatrix_info(H)
    assert info["space_saving"] > 0.3


def test_matrix_generator_roundtrip():
    rng = np.random.RandomState(0)
    n = 200
    pts = create_sphere(n)
    # low-rank-ish smooth matrix via kernel evaluation
    gen0 = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    A = np.asarray(gen0.to_dense())
    gen = ht.MatrixGenerator(A)
    tree = ht.build_cluster_tree(pts, max_leaf_size=25)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0)
    assert rel_fro(H.to_dense(), A) < 1e-5


def test_reqrank_build():
    """Fixed-rank compression (reqrank > 0)."""
    nt, ns = 300, 250
    tp = create_sphere(nt, seed=0)
    sp = create_sphere(ns, radius=2.0, center=(3.0, 0.0, 0.0), seed=1)
    gen = ht.KernelGenerator(laplace_kernel, tp, sp)
    tt = ht.build_cluster_tree(tp, max_leaf_size=40)
    st = ht.build_cluster_tree(sp, max_leaf_size=40)
    H = ht.build_hmatrix(gen, tt, st, epsilon=1e-8, eta=100.0, reqrank=5)
    info = ht.hmatrix_info(H)
    assert info["rank_max"] <= 5
    # well-separated clouds: rank-5 already decent
    assert rel_fro(H.to_dense(), np.asarray(gen.to_dense())) < 1e-2


def test_copy_diagonal():
    """copy_diagonal / copy_diagonal_in_user_numbering (hmatrix.hpp:401,434)."""
    from htool_tpu.hmatrix.linalg import copy_diagonal, copy_diagonal_user
    from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

    pts = create_sphere(700)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=50)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-6, eta=10.0)
    A = np.asarray(gen.to_dense())
    Pm = tree.permutation
    d_cluster = np.asarray(copy_diagonal(H))
    assert np.allclose(d_cluster, np.diag(A)[Pm])
    d_user = np.asarray(copy_diagonal_user(H))
    assert np.allclose(d_user, np.diag(A))


def test_custom_compressor_hook():
    """User-pluggable compressor callable (the VirtualLowRankGenerator
    surface, virtual_lrmat_generator.hpp:11-56)."""
    from htool_tpu.hmatrix.aca import batched_partial_aca
    from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

    pts = create_sphere(800)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    A = np.asarray(gen.to_dense())
    calls = []

    def my_comp(g, rows, cols, ts, ss, eps, rmax, reqrank):
        calls.append(int(rows.shape[0]))
        return batched_partial_aca(g, rows, cols, ts, ss, eps, rmax, reqrank)

    H = ht.build_hmatrix(gen, tree, epsilon=1e-6, eta=10.0, compressor=my_comp)
    assert calls, "custom compressor was never invoked"
    err = np.linalg.norm(H.to_dense() - A) / np.linalg.norm(A)
    assert err < 1e-6


def test_recompressed_assembly_lowers_rank():
    """recompress=True (the RecompressedLowRankGenerator decorator,
    recompressed_low_rank_generator.hpp:19-25) must lower the mean rank at
    equal accuracy."""
    from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

    pts = create_sphere(1500)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=64)
    A = np.asarray(gen.to_dense())
    H = ht.build_hmatrix(gen, tree, epsilon=1e-6, eta=10.0)
    Hr = ht.build_hmatrix(gen, tree, epsilon=1e-6, eta=10.0, recompress=True)
    err = np.linalg.norm(Hr.to_dense() - A) / np.linalg.norm(A)
    assert err < 5e-6
    assert ht.hmatrix_info(Hr)["rank_mean"] <= ht.hmatrix_info(H)["rank_mean"]


def test_custom_admissibility_condition():
    """Pluggable VirtualAdmissibilityCondition hook
    (virtual_admissibility_condition.hpp:17-24): a custom callable drives
    the block-tree pruning through the python planner."""
    n = 600
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=50)
    calls = []

    def strict(tc, tr, sc, sr, eta):
        calls.append(1)
        # stricter than RjasanowSteinbach: admissible only at 3x separation
        d = float(np.linalg.norm(tc - sc))
        return 2.0 * min(tr, sr) < (eta / 3.0) * max(d - tr - sr, 0.0)

    H = ht.build_hmatrix(
        gen, tree, epsilon=1e-4, eta=10.0, admissibility=strict
    )
    assert calls, "custom condition was never evaluated"
    A = np.asarray(gen.to_dense())
    assert rel_fro(H.to_dense(), A) < 1e-4
    # stricter condition => fewer admissible (more dense) blocks than default
    H0 = ht.build_hmatrix(gen, tree, epsilon=1e-4, eta=10.0)
    assert H.info["n_low_rank_blocks"] <= H0.info["n_low_rank_blocks"]
    # the native planner cannot evaluate python callables
    with pytest.raises(ValueError):
        ht.plan_block_tree(tree, eta=10.0, admissibility=strict, backend="native")
