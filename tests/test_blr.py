"""BLR arithmetic tests — the H-arithmetic capability layer (H-LU,
triangular solves via factorized solve, H×H product), oracle = dense linalg,
mirroring tests/functional_tests/hmatrix/{factorization,hmatrix_product}."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.blr import (
    blr_cholesky,
    blr_lu,
    blr_matmul,
    blr_matvec,
    blr_solve,
    build_blr,
)
from htool_tpu.testing import (
    create_sphere,
    grid_laplacian,
    laplace_kernel_hermitian,
    laplace_kernel_symmetric,
)


def build_case(n=1600, eps=1e-6, block=80):
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    A = np.asarray(gen.to_dense())
    Pm = tree.permutation
    Ac = A[np.ix_(Pm, Pm)]
    B = build_blr(gen, tree, epsilon=eps, eta=10.0, block_size=block)
    return B, Ac


def test_blr_build():
    B, Ac = build_case()
    err = np.linalg.norm(B.to_dense() - Ac) / np.linalg.norm(Ac)
    assert err < 1e-6
    info = B.compression_info()
    assert info["n_lr_cells"] > 0
    assert info["compression_ratio"] > 1.0


def test_blr_matvec():
    B, Ac = build_case()
    x = np.random.RandomState(0).randn(Ac.shape[0], 2)
    y = np.asarray(blr_matvec(B, x))
    ref = Ac @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-6


@pytest.mark.parametrize("nrhs", [1, 3])
@pytest.mark.slow
def test_blr_lu_solve(nrhs):
    B, Ac = build_case()
    F = blr_lu(B)
    rng = np.random.RandomState(1)
    x = rng.randn(Ac.shape[0], nrhs)
    if nrhs == 1:
        x = x[:, 0]
    b = Ac @ x
    sol = np.asarray(blr_solve(F, b))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-5


def test_blr_lu_grid_laplacian():
    """SPD sparse-structured matrix (fill-in stress)."""
    pts, A = grid_laplacian((8, 8, 6))
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    gen = ht.MatrixGenerator(A)
    Pm = tree.permutation
    Ac = A[np.ix_(Pm, Pm)]
    B = build_blr(gen, tree, epsilon=1e-8, block_size=64)
    F = blr_lu(B)
    x = np.random.RandomState(2).randn(A.shape[0])
    sol = np.asarray(blr_solve(F, Ac @ x))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-6


@pytest.mark.parametrize("nrhs", [1, 3])
def test_blr_cholesky_grid_laplacian(nrhs):
    """SPD matrix: BLR Cholesky (H-Cholesky parity, factorization.hpp:131-205)."""
    pts, A = grid_laplacian((8, 8, 6))
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    gen = ht.MatrixGenerator(A)
    Pm = tree.permutation
    Ac = A[np.ix_(Pm, Pm)]
    B = build_blr(gen, tree, epsilon=1e-8, block_size=64)
    F = blr_cholesky(B)
    assert F.kind == "chol"
    rng = np.random.RandomState(4)
    x = rng.randn(A.shape[0], nrhs)
    if nrhs == 1:
        x = x[:, 0]
    sol = np.asarray(blr_solve(F, Ac @ x))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-6


@pytest.mark.slow
def test_blr_cholesky_kernel_spd():
    """Dense-structured SPD: shifted Laplace kernel matrix on a sphere."""
    n = 800
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    K = np.asarray(ht.KernelGenerator(laplace_kernel_symmetric, pts, pts).to_dense())
    lam = np.linalg.eigvalsh(K).min()
    A = K + (max(0.0, -lam) + 0.1) * np.eye(n)
    gen = ht.MatrixGenerator(A)
    Pm = tree.permutation
    Ac = A[np.ix_(Pm, Pm)]
    B = build_blr(gen, tree, epsilon=1e-8, block_size=80)
    F = blr_cholesky(B)
    x = np.random.RandomState(5).randn(n)
    sol = np.asarray(blr_solve(F, Ac @ x))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-5


def test_blr_cholesky_complex_hermitian():
    """Complex HPD (hermitian kernel + shift): the potrf 'H' path."""
    n = 600
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    K = np.asarray(ht.KernelGenerator(laplace_kernel_hermitian, pts, pts).to_dense())
    K = 0.5 * (K + K.conj().T)  # enforce exact hermitian symmetry
    lam = np.linalg.eigvalsh(K).min()
    A = K + (max(0.0, -lam) + 0.1) * np.eye(n)
    gen = ht.MatrixGenerator(A)
    Pm = tree.permutation
    Ac = A[np.ix_(Pm, Pm)]
    B = build_blr(gen, tree, epsilon=1e-8, block_size=80)
    F = blr_cholesky(B)
    rng = np.random.RandomState(6)
    x = rng.randn(n) + 1j * rng.randn(n)
    sol = np.asarray(blr_solve(F, Ac @ x))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-5


def test_blr_matmul():
    B, Ac = build_case(n=800, block=80)
    C = blr_matmul(B, B, epsilon=1e-6)
    ref = Ac @ Ac
    err = np.linalg.norm(C.to_dense() - ref) / np.linalg.norm(ref)
    assert err < 1e-5


def test_blr_solve_user_numbering():
    B, Ac = build_case(n=600)
    # user-numbering round trip: solve in user numbering against the
    # user-numbered dense matrix
    A_user = B.to_dense(user_numbering=True)
    F = blr_lu(B)
    x = np.random.RandomState(3).randn(600)
    sol = np.asarray(blr_solve(F, A_user @ x, user_numbering=True))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-5


@pytest.mark.slow
def test_ddm_with_blr_local_solver():
    """RAS preconditioner with BLR-factorized subdomain solves (the H-LU
    local solver mode of the reference DDM)."""
    from htool_tpu.solvers import DDMSolver

    pts, A = grid_laplacian((9, 9, 6))
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=4)
    gen = ht.MatrixGenerator(A)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    b = np.random.RandomState(0).randn(A.shape[0])
    s = DDMSolver(
        H,
        gen,
        tree,
        schwarz="ras",
        overlap_radius=1.5,
        local_solver="blr",
        blr_epsilon=1e-8,
        blr_block_size=64,
    )
    x, infos = s.solve(b, tol=1e-6, maxiter=300, krylov="gmres")
    assert infos["Converged"]
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 1e-4
    # BLR local solves should behave like dense local solves iteration-wise
    s2 = DDMSolver(H, gen, tree, schwarz="ras", overlap_radius=1.5)
    _, infos2 = s2.solve(b, tol=1e-6, maxiter=300, krylov="gmres")
    assert abs(infos["Nb_it"] - infos2["Nb_it"]) <= 2


@pytest.mark.slow
def test_factorization_accuracy_guard():
    """Rank-cap detection + auto-escalation + backward-error estimate
    (the accuracy guard over the silent R_half truncation in the Schur
    recompressions)."""
    pts = create_sphere(900)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    A = build_blr(gen, tree, epsilon=1e-4, eta=10.0, block_size=80, R_half=8)
    F0 = blr_lu(A, epsilon=1e-12, auto_escalate=0)
    F1 = blr_lu(A, epsilon=1e-12, auto_escalate=3)
    assert F0.info["n_rank_capped_cells"] > 0
    assert F1.info["n_rank_capped_cells"] == 0
    assert F1.info["R_half"] > F0.info["R_half"]
    # the reported estimate matches the true sampled factor error
    from htool_tpu.hmatrix.blr import blr_backward_error

    est = blr_backward_error(A, F1, n_probe=4, seed=3)
    assert est < 10 * 1e-4  # <= 10 eps_build
    assert "backward_error_est" in F1.info


@pytest.mark.slow
def test_two_level_blr_lu():
    """Two-level panel factorization (blr2): BLR diagonal panels +
    panel-level low-rank off-diagonals — memory below one-level BLR at
    equal accuracy, solve error ~epsilon (factorization.hpp:19-79
    asymptotics)."""
    from htool_tpu.hmatrix.blr2 import (
        blr2_lu,
        blr2_matvec,
        blr2_solve,
        build_blr2,
    )

    n = 3000
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=64)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    eps = 1e-6
    A2 = build_blr2(gen, tree, epsilon=eps, coarse_size=800, block_size=80,
                    diag_mode="blr")
    Ad = np.asarray(gen.to_dense())
    Pm = tree.permutation
    Adc = Ad[np.ix_(Pm, Pm)]
    x = np.random.default_rng(0).standard_normal((n, 2))
    y = np.asarray(blr2_matvec(A2, x))
    assert np.linalg.norm(y - Adc @ x) / np.linalg.norm(Adc @ x) < 10 * eps

    # memory below the one-level representation at the same epsilon
    m2 = A2.memory_bytes()
    A1 = build_blr(gen, tree, epsilon=eps, block_size=80)
    m1 = (A1.D.size + A1.U.size + A1.V.size) * A1.D.dtype.itemsize
    assert m2 < m1, (m2, m1)

    F2 = blr2_lu(A2)
    xs = np.asarray(blr2_solve(F2, Adc @ x))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 10 * eps
    # user-numbering round trip
    xs_u = np.asarray(blr2_solve(F2, Ad @ x, user_numbering=True))
    assert np.linalg.norm(xs_u - x) / np.linalg.norm(x) < 10 * eps
