"""Mixed dense/LR/H-matrix product oracle tests (reference
``hmatrix/linalg/add_{matrix_hmatrix,hmatrix_lrmat,lrmat_hmatrix}_product.hpp``
and ``hmatrix/lrmat/linalg/*`` — each product checked against the dense
composition, mirroring the reference's functional-test pattern, SURVEY §4)."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.lr_linalg import (
    LowRank,
    add_lrmat_lrmat,
    hmatrix_lrmat_product,
    lrmat_from_dense,
    lrmat_hmatrix_product,
    lrmat_lrmat_product,
    lrmat_matrix_product,
    lrmat_vector_product,
    matrix_hmatrix_product,
    matrix_lrmat_product,
    scale_lrmat,
)
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric


def rel(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / max(
        np.linalg.norm(np.asarray(b)), 1e-300
    )


@pytest.fixture(scope="module")
def hmat():
    pts = create_sphere(600)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=48)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-8, eta=10.0)
    A = np.asarray(gen.to_dense())
    # cluster numbering: products in lr_linalg are cluster-numbered
    P = tree.permutation
    Ac = A[np.ix_(P, P)]
    return H, Ac


def _rand_lr(rng, m, n, r, cplx=False):
    U = rng.randn(m, r)
    V = rng.randn(r, n)
    if cplx:
        U = U + 1j * rng.randn(m, r)
        V = V + 1j * rng.randn(r, n)
    return LowRank(np.asarray(U), np.asarray(V))


@pytest.mark.parametrize("cplx", [False, True])
def test_lr_basic_products(cplx):
    rng = np.random.RandomState(0)
    lr = _rand_lr(rng, 30, 20, 5, cplx)
    D = lr.to_dense()
    x = rng.randn(20, 3)
    assert rel(lrmat_vector_product(lr, x), D @ x) < 1e-12
    xt = rng.randn(30, 2)
    assert rel(lrmat_vector_product(lr, xt, op="T"), D.T @ xt) < 1e-12
    assert rel(lrmat_vector_product(lr, xt, op="C"), np.conj(D.T) @ xt) < 1e-12

    B = rng.randn(20, 7)
    assert rel(lrmat_matrix_product(lr, B).to_dense(), D @ B) < 1e-12
    Bt = rng.randn(30, 4)
    assert rel(lrmat_matrix_product(lr, Bt, op="T").to_dense(), D.T @ Bt) < 1e-12
    A2 = rng.randn(14, 30)
    assert rel(matrix_lrmat_product(A2, lr).to_dense(), A2 @ D) < 1e-12
    A3 = rng.randn(20, 14)
    assert rel(matrix_lrmat_product(A3, lr, opa="T", op="T").to_dense(), A3.T @ D.T) < 1e-12
    assert rel(scale_lrmat(2.5, lr).to_dense(), 2.5 * D) < 1e-12


def test_lr_lr_product_and_add():
    rng = np.random.RandomState(1)
    a = _rand_lr(rng, 25, 18, 4)
    b = _rand_lr(rng, 18, 22, 6)
    C = lrmat_lrmat_product(a, b)
    assert C.rank == 4  # absorbed into smaller-rank side
    assert rel(C.to_dense(), a.to_dense() @ b.to_dense()) < 1e-12

    c = _rand_lr(rng, 25, 18, 3)
    s = add_lrmat_lrmat(a, c, epsilon=1e-12)
    assert rel(s.to_dense(), a.to_dense() + c.to_dense()) < 1e-10
    assert s.rank <= 7
    # truncation actually truncates: adding a block to itself keeps rank
    s2 = add_lrmat_lrmat(a, scale_lrmat(-0.5, a), epsilon=1e-10)
    assert s2.rank <= 4


def test_lrmat_from_dense():
    rng = np.random.RandomState(2)
    base = _rand_lr(rng, 40, 35, 6)
    D = base.to_dense()
    lr = lrmat_from_dense(D, epsilon=1e-10)
    assert lr.rank <= 8
    assert rel(lr.to_dense(), D) < 1e-9


def test_matrix_hmatrix_product(hmat):
    H, Ac = hmat
    rng = np.random.RandomState(3)
    X = rng.randn(9, Ac.shape[0])
    assert rel(matrix_hmatrix_product(X, H), X @ Ac) < 1e-6
    assert rel(matrix_hmatrix_product(X, H, oph="T"), X @ Ac.T) < 1e-6
    Xc = X + 1j * rng.randn(*X.shape)
    got = matrix_hmatrix_product(Xc, H, oph="C")
    assert rel(got, Xc @ np.conj(Ac.T)) < 1e-6


def test_hmatrix_lrmat_products(hmat):
    H, Ac = hmat
    n = Ac.shape[0]
    rng = np.random.RandomState(4)
    lr = _rand_lr(rng, n, 17, 5)
    got = hmatrix_lrmat_product(H, lr)
    assert rel(got.to_dense(), Ac @ lr.to_dense()) < 1e-6

    lr2 = _rand_lr(rng, 13, n, 5)
    got2 = lrmat_hmatrix_product(lr2, H)
    assert rel(got2.to_dense(), lr2.to_dense() @ Ac) < 1e-6
    got3 = lrmat_hmatrix_product(lr2, H, oph="T")
    assert rel(got3.to_dense(), lr2.to_dense() @ Ac.T) < 1e-6
