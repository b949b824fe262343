"""Standalone block-triangular solve tests — the reference's
triangular_hmatrix_matrix_solve grid (side x trans x factor x nrhs x
real/complex, tests/functional_tests/hmatrix/triangular_solve), oracle =
chained solves reproducing the exact factorization inverse."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.blr import (
    blr_cholesky,
    blr_lu,
    blr_solve,
    blr_triangular_solve,
    build_blr,
)
from htool_tpu.testing import (
    create_sphere,
    laplace_kernel_hermitian,
    laplace_kernel_symmetric,
)

# full grids / large n: default CI tier skips these (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _case(kernel, n=900, eps=1e-9, block=80):
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    gen = ht.KernelGenerator(kernel, pts, pts)
    Ad = np.asarray(gen.to_dense())
    Pm = tree.permutation
    Ad = Ad[np.ix_(Pm, Pm)]
    A = build_blr(gen, tree, epsilon=eps, eta=10.0, block_size=block)
    return A, Ad


@pytest.fixture(scope="module")
def lu_case():
    A, Ad = _case(laplace_kernel_symmetric)
    return blr_lu(A), Ad


@pytest.fixture(scope="module")
def chol_case():
    A, Ad = _case(laplace_kernel_hermitian, eps=1e-10)
    return blr_cholesky(A), Ad


@pytest.mark.parametrize("trans", ["N", "T", "C"])
@pytest.mark.parametrize("nrhs", [1, 5])
def test_lu_solve_trans(lu_case, trans, nrhs):
    F, Ad = lu_case
    n = Ad.shape[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, nrhs)) if nrhs > 1 else rng.standard_normal(n)
    op = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
    b = op @ x
    xs = np.asarray(blr_solve(F, b, trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-8


@pytest.mark.parametrize("trans", ["N", "T", "C"])
def test_lu_triangular_chain_left(lu_case, trans):
    """op(A) = chain of the two triangular factors: solving both factors in
    order must reproduce the full solve (side 'L')."""
    F, Ad = lu_case
    n = Ad.shape[0]
    x = np.random.default_rng(1).standard_normal((n, 3))
    op = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
    b = op @ x
    if trans == "N":
        y = blr_triangular_solve(F, b, which="L", trans="N")
        xs = np.asarray(blr_triangular_solve(F, y, which="U", trans="N"))
    else:
        y = blr_triangular_solve(F, b, which="U", trans=trans)
        xs = np.asarray(blr_triangular_solve(F, y, which="L", trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-8


@pytest.mark.parametrize("trans", ["N", "T", "C"])
def test_lu_triangular_chain_right(lu_case, trans):
    """side 'R': X·op(A) = B solved as two side-'R' triangular solves."""
    F, Ad = lu_case
    n = Ad.shape[0]
    X = np.random.default_rng(2).standard_normal((3, n))
    op = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
    B = X @ op
    if trans == "N":
        # X L U = B: Y U = B then X L = Y
        Y = blr_triangular_solve(F, B, which="U", side="R", trans="N")
        Xs = np.asarray(blr_triangular_solve(F, Y, which="L", side="R", trans="N"))
    else:
        # X op(U) op(L) reversed: X op(L^t..) — op(A) = op(U·L) order flips
        Y = blr_triangular_solve(F, B, which="L", side="R", trans=trans)
        Xs = np.asarray(blr_triangular_solve(F, Y, which="U", side="R", trans=trans))
    assert np.linalg.norm(Xs - X) / np.linalg.norm(X) < 1e-8


def test_lu_triangular_lr_rhs(lu_case):
    """Low-rank RHS variant (triangular_hmatrix_lrmat_solve.hpp): the solved
    pair must reproduce solving the dense product."""
    F, Ad = lu_case
    n = Ad.shape[0]
    rng = np.random.default_rng(3)
    Ub, Vb = rng.standard_normal((n, 4)), rng.standard_normal((4, n))
    Us, Vs = blr_triangular_solve(F, (Ub, Vb), which="L", trans="N")
    ref = np.asarray(blr_triangular_solve(F, Ub @ Vb, which="L", trans="N"))
    assert np.linalg.norm(np.asarray(Us) @ np.asarray(Vs) - ref) < 1e-8 * np.linalg.norm(ref)
    # side R solves on the V factor
    Us2, Vs2 = blr_triangular_solve(F, (Ub, Vb), which="U", side="R", trans="N")
    ref2 = np.asarray(blr_triangular_solve(F, Ub @ Vb, which="U", side="R", trans="N"))
    assert np.linalg.norm(np.asarray(Us2) @ np.asarray(Vs2) - ref2) < 1e-8 * np.linalg.norm(ref2)


@pytest.mark.parametrize("trans", ["N", "T", "C"])
def test_chol_solve_trans(chol_case, trans):
    F, Ad = chol_case
    n = Ad.shape[0]
    rng = np.random.default_rng(4)
    x = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    op = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
    b = op @ x
    xs = np.asarray(blr_solve(F, b, trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-8


@pytest.mark.parametrize("trans", ["N", "T", "C"])
def test_chol_triangular_chain(chol_case, trans):
    """A = L L^H: chained factor solves across trans for the hermitian case."""
    F, Ad = chol_case
    n = Ad.shape[0]
    rng = np.random.default_rng(5)
    x = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    op = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
    b = op @ x
    if trans == "N":  # L then L^H (= which 'U')
        y = blr_triangular_solve(F, b, which="L", trans="N")
        xs = np.asarray(blr_triangular_solve(F, y, which="U", trans="N"))
    elif trans == "T":  # A^T = conj(L) L^T: conj(L) = (L^H)^T = U^T
        y = blr_triangular_solve(F, b, which="U", trans="T")
        xs = np.asarray(blr_triangular_solve(F, y, which="L", trans="T"))
    else:  # A^H = A
        y = blr_triangular_solve(F, b, which="L", trans="N")
        xs = np.asarray(blr_triangular_solve(F, y, which="U", trans="N"))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-8


def test_triangular_solve_compressed_rhs(lu_case):
    """H-H triangular solve (triangular_hmatrix_hmatrix_solve.hpp:19-198):
    compressed RHS and compressed result.  Chaining both factors on both
    sides must reproduce the identity."""
    from htool_tpu.hmatrix.blr import (
        blr_transpose,
        blr_triangular_solve_matrix,
        build_blr,
    )

    F, Ad = lu_case
    pts = create_sphere(900)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    A = build_blr(gen, tree, epsilon=1e-9, eta=10.0, block_size=80)
    n = Ad.shape[0]
    X = blr_triangular_solve_matrix(F, A, which="L", trans="N", epsilon=1e-10)
    Y = blr_triangular_solve_matrix(F, X, which="U", trans="N", epsilon=1e-10)
    assert np.linalg.norm(Y.to_dense() - np.eye(n)) / np.sqrt(n) < 1e-7
    Xr = blr_triangular_solve_matrix(F, A, which="U", side="R", trans="N", epsilon=1e-10)
    Zr = blr_triangular_solve_matrix(F, Xr, which="L", side="R", trans="N", epsilon=1e-10)
    assert np.linalg.norm(Zr.to_dense() - np.eye(n)) / np.sqrt(n) < 1e-7
    # transpose helper oracle
    assert np.allclose(blr_transpose(A).to_dense(), A.to_dense().T)
