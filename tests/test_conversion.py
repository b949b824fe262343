"""Assembled-H post-processing: recompression over all LR leaves
(reference hmatrix/utils/recompression.hpp) and H→BLR conversion feeding the
user-facing factorization surface lu_factorization / cholesky_factorization /
lu_solve / cholesky_solve / hmatrix_hmatrix_product
(reference hmatrix/linalg/factorization.hpp:82-290,
add_hmatrix_hmatrix_product.hpp:210).  Oracle = dense linalg."""

import jax.numpy as jnp
import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.blr import blr_matvec
from htool_tpu.testing import (
    create_sphere,
    laplace_kernel_hermitian,
    laplace_kernel_symmetric,
)


def build_case(n=1200, eps=1e-5, symmetry="N", kernel=laplace_kernel_symmetric):
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    gen = ht.KernelGenerator(kernel, pts, pts)
    kwargs = {}
    if symmetry != "N":
        kwargs = dict(symmetry=symmetry, UPLO="L")
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0, **kwargs)
    A = np.asarray(gen.to_dense())
    Pm = tree.permutation
    Ac = A[np.ix_(Pm, Pm)]
    return H, tree, Ac


def test_recompress_hmatrix():
    H, tree, Ac = build_case(eps=1e-8)
    H2 = ht.recompress_hmatrix(H, 1e-4)
    # coarser epsilon must not increase any stored rank, and often shrinks
    r_old = sum(int(np.asarray(b.ranks).sum()) for b in H.lr_buckets)
    r_new = sum(int(np.asarray(b.ranks).sum()) for b in H2.lr_buckets)
    assert r_new < r_old
    D2 = H2.to_dense(user_numbering=False)
    err = np.linalg.norm(D2 - Ac) / np.linalg.norm(Ac)
    assert err < 1e-3


@pytest.mark.parametrize("symmetry", ["N", "S"])
def test_to_blr_matches_hmatrix(symmetry):
    H, tree, Ac = build_case(symmetry=symmetry)
    B = ht.to_blr(H, tree, block_size=80)
    err = np.linalg.norm(B.to_dense() - Ac) / np.linalg.norm(Ac)
    assert err < 1e-4
    assert B.compression_info()["n_lr_cells"] > 0


def test_to_blr_hermitian():
    H, tree, Ac = build_case(symmetry="H", kernel=laplace_kernel_hermitian)
    B = ht.to_blr(H, tree, block_size=80)
    err = np.linalg.norm(B.to_dense() - Ac) / np.linalg.norm(Ac)
    assert err < 1e-4


@pytest.mark.parametrize("nrhs", [1, 3])
@pytest.mark.slow
def test_lu_factorization_of_assembled_h(nrhs):
    H, tree, Ac = build_case()
    F = ht.lu_factorization(H, tree, epsilon=1e-7, block_size=80)
    rng = np.random.RandomState(3)
    x = rng.randn(Ac.shape[0], nrhs)
    if nrhs == 1:
        x = x[:, 0]
    b = Ac @ x
    sol = np.asarray(ht.lu_solve(F, b, user_numbering=False))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-3
    with pytest.raises(ValueError):
        ht.cholesky_solve(F, b, user_numbering=False)


def test_cholesky_factorization_of_assembled_h():
    H, tree, Ac = build_case(symmetry="S")
    F = ht.cholesky_factorization(H, tree, epsilon=1e-7, block_size=80)
    x = np.random.RandomState(4).randn(Ac.shape[0])
    sol = np.asarray(ht.cholesky_solve(F, Ac @ x, user_numbering=False))
    assert np.linalg.norm(sol - x) / np.linalg.norm(x) < 1e-3


def test_hmatrix_hmatrix_product():
    H, tree, Ac = build_case()
    C = ht.hmatrix_hmatrix_product(H, H, tree, epsilon=1e-7, block_size=80)
    x = np.random.RandomState(5).randn(Ac.shape[0])
    y = np.asarray(blr_matvec(C, x))
    ref = Ac @ (Ac @ x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-3


def test_blr_matmul_mixed_grids():
    """Operands on different grids auto re-tile onto a common grid — the
    flat-layout counterpart of the reference's inconsistent-tree recursion
    (add_hmatrix_hmatrix_product.hpp:31-74)."""
    from htool_tpu.hmatrix.blr import blr_matmul, build_blr
    from htool_tpu.hmatrix.conversion import retile_blr

    n = 1200
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=50)
    Pm = tree.permutation
    Adc = np.asarray(gen.to_dense())[np.ix_(Pm, Pm)]
    A = build_blr(gen, tree, epsilon=1e-8, eta=10.0, block_size=75)
    B = build_blr(gen, tree, epsilon=1e-8, eta=10.0, block_size=150)
    assert A.nL != B.nL
    # lossless re-tile
    Ar = retile_blr(A, np.asarray(B.cell_off), np.asarray(B.cell_size), b=B.b)
    errr = np.linalg.norm(Ar.to_dense() - Adc) / np.linalg.norm(Adc)
    assert errr < 1e-6, errr
    C = blr_matmul(A, B)
    ref = Adc @ Adc
    err = np.linalg.norm(C.to_dense() - ref) / np.linalg.norm(ref)
    assert err < 1e-5, err


def test_blr_trisolve_matrix_mixed_grids():
    from htool_tpu.hmatrix.blr import (
        blr_lu,
        blr_triangular_solve,
        blr_triangular_solve_matrix,
        build_blr,
    )
    from htool_tpu.hmatrix.conversion import retile_blr

    n = 1200
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=50)
    A = build_blr(gen, tree, epsilon=1e-8, eta=10.0, block_size=75)
    B = build_blr(gen, tree, epsilon=1e-8, eta=10.0, block_size=150)
    F = blr_lu(B, error_estimate=False)
    X = blr_triangular_solve_matrix(F, A, which="L", side="L", trans="N")
    Ar = retile_blr(A, np.asarray(B.cell_off), np.asarray(B.cell_size), b=B.b)
    ref = np.asarray(
        blr_triangular_solve(
            F, jnp.asarray(Ar.to_dense()), which="L", side="L", trans="N"
        )
    )
    err = np.linalg.norm(X.to_dense() - ref) / np.linalg.norm(ref)
    assert err < 1e-5, err


def test_to_blr_partition_restricted():
    """A device's local block-row converts directly: the diagonal square of
    the restricted H-matrix lands on a local BLR grid and factorizes — the
    DDM local-solver path on the reference's block_diagonal_hmatrix
    (distributed_operator/utility.hpp:37-61)."""
    from htool_tpu.hmatrix.blr import blr_lu, blr_solve

    n, P = 1200, 4
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=50, n_partitions=P)
    Pm = tree.permutation
    Adc = np.asarray(gen.to_dense())[np.ix_(Pm, Pm)]
    offs, szs = tree.partition_offsets_sizes()
    for p in (0, P - 1):
        Hp = ht.build_hmatrix(gen, tree, epsilon=1e-8, eta=10.0, target_partition=p)
        Bp = ht.to_blr(Hp, tree, block_size=100, epsilon=1e-8)
        r0, m = int(offs[p]), int(szs[p])
        Dref = Adc[r0 : r0 + m, r0 : r0 + m]
        err = np.linalg.norm(Bp.to_dense() - Dref) / np.linalg.norm(Dref)
        assert err < 1e-6, (p, err)
        F = blr_lu(Bp, error_estimate=False)
        x = np.random.RandomState(p).randn(m)
        sol = np.asarray(blr_solve(F, jnp.asarray(Dref @ x)))
        err = np.linalg.norm(sol - x) / np.linalg.norm(x)
        assert err < 1e-5, (p, err)


def test_hmatrix_product_mixed_trees():
    """H×H across DIFFERENT cluster trees (VERDICT r3 item 8): B is
    re-expressed in A's cluster numbering via permute_blr before the
    compressed product (the reference's inconsistent-tree recursion,
    add_hmatrix_hmatrix_product.hpp:31-74)."""
    n = 1000
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree_a = ht.build_cluster_tree(pts, max_leaf_size=40)
    tree_b = ht.build_cluster_tree(pts, max_leaf_size=64, n_children=3)
    assert not np.array_equal(tree_a.permutation, tree_b.permutation)
    A = ht.build_hmatrix(gen, tree_a, epsilon=1e-7, eta=10.0)
    B = ht.build_hmatrix(gen, tree_b, epsilon=1e-7, eta=10.0)
    Ad = np.asarray(gen.to_dense())
    Pa = tree_a.permutation
    Ac = Ad[np.ix_(Pa, Pa)]
    C = ht.hmatrix_hmatrix_product(
        A, B, tree_a, epsilon=1e-7, block_size=80, tree_b=tree_b
    )
    # result lives on tree_a's numbering/grid
    x = np.random.RandomState(5).randn(n)
    y = np.asarray(blr_matvec(C, x))
    ref = Ac @ (Ac @ x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-3


def test_permute_blr_roundtrip():
    """permute_blr alone: X' in another tree's numbering reconstructs the
    same user-numbering operator, with compression retained."""
    from htool_tpu.hmatrix.blr import build_blr

    n = 1000
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree_a = ht.build_cluster_tree(pts, max_leaf_size=50)
    tree_b = ht.build_cluster_tree(pts, max_leaf_size=80, n_children=3)
    X = build_blr(gen, tree_b, epsilon=1e-6, eta=10.0, block_size=80)
    Fa = build_blr(gen, tree_a, epsilon=1e-6, eta=10.0, block_size=80)
    q = np.argsort(np.asarray(tree_a.permutation))[np.asarray(tree_b.permutation)]
    Xp = ht.permute_blr(
        X, q, np.asarray(Fa.cell_off), np.asarray(Fa.cell_size), b=Fa.b,
        R_half=Fa.R_half,
    )
    Ad = np.asarray(gen.to_dense())
    Pa = tree_a.permutation
    Ac = Ad[np.ix_(Pa, Pa)]
    err = np.linalg.norm(Xp.to_dense() - Ac) / np.linalg.norm(Ac)
    assert err < 1e-4, err
    # compression parity with the directly-built operator on tree_a
    assert (
        Xp.compression_info()["compression_ratio"]
        >= 0.8 * Fa.compression_info()["compression_ratio"]
    )


@pytest.mark.slow
def test_blr_to_hmatrix_roundtrip():
    """Product -> blr_to_hmatrix -> matvec_user vs dense oracle (VERDICT r4
    item 8): the H×H product result re-enters the HMatrix product fast path
    and the npz persistence surface (reference writes products back into an
    HMatrix, add_hmatrix_hmatrix_product.hpp:210)."""
    # n large enough that the flat product grid keeps low-rank cells (at
    # n <= 2000 a sphere's 16-cell grid is dense-dominated and the product
    # classification correctly yields all-dense)
    H, tree, Ac = build_case(n=4000, eps=1e-6)
    C = ht.hmatrix_hmatrix_product(H, H, tree, epsilon=1e-5, block_size=128)
    Hc = ht.blr_to_hmatrix(C, tree)
    assert Hc.lr_buckets and Hc.dense_buckets
    rng = np.random.RandomState(7)
    x = rng.randn(Ac.shape[0], 2)
    y = np.asarray(Hc @ jnp.asarray(x))  # user numbering
    Pm = tree.permutation
    A = np.zeros_like(Ac)
    A[np.ix_(Pm, Pm)] = Ac
    ref = A @ (A @ x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-3
    # persistence round-trip (save/load keeps the bucket structure)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "prod.npz")
        ht.save_hmatrix(Hc, path)
        H2 = ht.load_hmatrix(path)
        y2 = np.asarray(H2 @ jnp.asarray(x))
        assert np.allclose(y, y2, atol=1e-5)
