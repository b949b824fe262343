"""H-matrix product tests — random-RHS + dense gemm oracle, sweeping
op in {N,T,C}, nrhs in {1,5}, symmetry — mirroring the reference product
test grids (tests/functional_tests/hmatrix/hmatrix_product/)."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.testing import (
    create_sphere,
    laplace_kernel,
    laplace_kernel_complex,
    laplace_kernel_hermitian,
    laplace_kernel_symmetric,
)

EPS = 1e-5


def build_case(kern, symmetry="N", UPLO="N", nt=350, ns=300):
    tp = create_sphere(nt, seed=0)
    square = symmetry != "N"
    sp = tp if square else create_sphere(ns, radius=1.5, seed=1)
    gen = ht.KernelGenerator(kern, tp, sp)
    tt = ht.build_cluster_tree(tp, max_leaf_size=30)
    st = tt if square else ht.build_cluster_tree(sp, max_leaf_size=30)
    H = ht.build_hmatrix(gen, tt, st, epsilon=EPS, eta=10.0, symmetry=symmetry, UPLO=UPLO)
    A = np.asarray(gen.to_dense())
    return H, A


def apply_dense(A, x, op):
    if op == "N":
        return A @ x
    if op == "T":
        return A.T @ x
    return np.conj(A.T) @ x


@pytest.mark.parametrize("op", ["N", "T", "C"])
@pytest.mark.parametrize("nrhs", [1, 5])
@pytest.mark.parametrize(
    "kern,symmetry,UPLO",
    [
        (laplace_kernel, "N", "N"),
        (laplace_kernel_complex, "N", "N"),
        (laplace_kernel_symmetric, "S", "L"),
        (laplace_kernel_hermitian, "H", "U"),
    ],
)
def test_matvec_vs_dense(op, nrhs, kern, symmetry, UPLO):
    H, A = build_case(kern, symmetry, UPLO)
    rng = np.random.RandomState(42)
    n_in = A.shape[1] if op == "N" else A.shape[0]
    x = rng.randn(n_in, nrhs)
    if np.iscomplexobj(A):
        x = x + 1j * rng.randn(n_in, nrhs)
    if nrhs == 1:
        x = x[:, 0]

    y = np.asarray(ht.matvec_user(H, x, op=op))
    y_ref = apply_dense(A, x, op)
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 10 * EPS


def test_matmul_operator():
    H, A = build_case(laplace_kernel)
    x = np.random.RandomState(0).randn(A.shape[1])
    assert np.allclose(np.asarray(H @ x), A @ x, rtol=0, atol=1e-4 * np.linalg.norm(A @ x))
