"""Distributed-operator tests on an emulated multi-device CPU mesh — the
analog of the reference's mpiexec-np-{1..4} distributed_operator tests
(tests/functional_tests/distributed_operator/test_distributed_operator.hpp:
71-110): random RHS, dense gemm oracle, g2g and l2l flavors, op in {N,T,C}."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.parallel import build_distributed_hmatrix, default_mesh
from htool_tpu.testing import (
    create_sphere,
    laplace_kernel_complex_symmetric,
    laplace_kernel_symmetric,
)

# full grids / large n: default CI tier skips these (pytest -m 'not slow')
pytestmark = pytest.mark.slow

EPS = 1e-5


def build_dist(P, kern=laplace_kernel_symmetric, n=500, partition=None):
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(
        pts, max_leaf_size=40, n_partitions=P, partition=partition
    )
    gen = ht.KernelGenerator(kern, pts, pts)
    mesh = default_mesh(P)
    D = build_distributed_hmatrix(gen, tree, mesh, epsilon=EPS, eta=10.0)
    A = np.asarray(gen.to_dense())
    return D, A, tree


@pytest.mark.parametrize("P", [1, 2, 3, 4, 8])
def test_distributed_build_vs_dense(P):
    D, A, _ = build_dist(P)
    err = np.linalg.norm(D.to_dense() - A) / np.linalg.norm(A)
    assert err < EPS


@pytest.mark.parametrize("P", [2, 4])
@pytest.mark.parametrize("op", ["N", "T", "C"])
@pytest.mark.parametrize("nrhs", [1, 5])
@pytest.mark.parametrize("kern", [laplace_kernel_symmetric, laplace_kernel_complex_symmetric])
def test_distributed_matvec_g2g(P, op, nrhs, kern):
    D, A, _ = build_dist(P, kern=kern)
    rng = np.random.RandomState(1)
    x = rng.randn(A.shape[0], nrhs)
    if np.iscomplexobj(A):
        x = x + 1j * rng.randn(*x.shape)
    if nrhs == 1:
        x = x[:, 0]
    y = np.asarray(D.matvec(x, op=op))
    Aop = A if op == "N" else (A.T if op == "T" else np.conj(A.T))
    ref = Aop @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 10 * EPS


@pytest.mark.parametrize("P", [2, 4])
@pytest.mark.parametrize("op", ["N", "T"])
def test_distributed_matvec_l2l(P, op):
    D, A, tree = build_dist(P)
    rng = np.random.RandomState(2)
    xc = rng.randn(A.shape[0], 2)  # cluster numbering
    x_loc = D.to_local_layout(xc)
    y_loc = np.asarray(D.matvec_local(x_loc, op=op))
    yc = np.asarray(D.to_global_layout(y_loc))
    # oracle in cluster numbering
    Pm = np.asarray(tree.permutation)
    Ac = A[np.ix_(Pm, Pm)]
    ref = (Ac if op == "N" else Ac.T) @ xc
    assert np.linalg.norm(yc - ref) / np.linalg.norm(ref) < 10 * EPS


def test_distributed_given_partition():
    P = 4
    n = 400
    part = np.repeat(np.arange(P), n // P)
    D, A, _ = build_dist(P, n=n, partition=part)
    x = np.random.RandomState(3).randn(n)
    y = np.asarray(D.matvec(x))
    assert np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x) < 10 * EPS


def test_mesh_partition_mismatch():
    pts = create_sphere(200)
    tree = ht.build_cluster_tree(pts, max_leaf_size=30, n_partitions=2)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    with pytest.raises(ValueError):
        build_distributed_hmatrix(gen, tree, default_mesh(4), epsilon=EPS)


@pytest.mark.parametrize("P", [2, 4])
@pytest.mark.parametrize("symmetry,UPLO", [("S", "L"), ("S", "U"), ("H", "L")])
def test_distributed_symmetric_storage(P, symmetry, UPLO):
    """Symmetric distributed storage: each device prunes its diagonal
    partition block (partition_number_for_symmetry) and products add mirror
    terms locally — results match dense, storage is reduced."""
    from htool_tpu.testing import laplace_kernel_hermitian

    kern = laplace_kernel_hermitian if symmetry == "H" else laplace_kernel_symmetric
    n = 500
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=P)
    gen = ht.KernelGenerator(kern, pts, pts)
    mesh = default_mesh(P)
    D = build_distributed_hmatrix(
        gen, tree, mesh, epsilon=EPS, eta=10.0, symmetry=symmetry, UPLO=UPLO
    )
    A = np.asarray(gen.to_dense())
    assert np.linalg.norm(D.to_dense() - A) / np.linalg.norm(A) < EPS

    rng = np.random.RandomState(5)
    x = rng.randn(n, 2)
    if symmetry == "H":
        x = x + 1j * rng.randn(n, 2)
    for op in ["N", "T", "C"]:
        y = np.asarray(D.matvec(x, op=op))
        Aop = A if op == "N" else (A.T if op == "T" else np.conj(A.T))
        ref = Aop @ x
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 10 * EPS, op

    # symmetric storage must be smaller than full storage
    D_full = build_distributed_hmatrix(gen, tree, mesh, epsilon=EPS, eta=10.0)
    def stored(d):
        tot = 0
        for b in d.dense_buckets:
            tot += int(np.sum(np.asarray(b.t_sizes) * np.asarray(b.s_sizes)))
        for b in d.lr_buckets:
            tot += int(
                np.sum(np.asarray(b.ranks) * (np.asarray(b.t_sizes) + np.asarray(b.s_sizes)))
            )
        return tot
    assert stored(D) < stored(D_full)


def test_local_diagonal_builder_block_jacobi():
    """DefaultLocalApproximationBuilder mode (utility.hpp:63-88): each
    device owns only its diagonal partition block; the operator equals the
    block-diagonal restriction, and a block-Jacobi DDM built from it
    converges on the grid problem."""
    from htool_tpu.parallel import (
        build_distributed_from_local_hmatrices,
        build_distributed_hmatrix,
        default_mesh,
    )
    from htool_tpu.solvers import DistributedDDMSolver
    from htool_tpu.testing import grid_laplacian

    Pn = 4
    pts, A = grid_laplacian((8, 8, 8))
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=Pn)
    gen = ht.MatrixGenerator(A)
    mesh = default_mesh(Pn)
    perm = tree.permutation
    Ac = A[np.ix_(perm, perm)]

    dl = build_distributed_hmatrix(
        gen, tree, mesh=mesh, epsilon=1e-10, eta=10.0, mode="local"
    )
    Dd = dl.to_dense(user_numbering=False)
    offs, sizes = tree.partition_offsets_sizes()
    Bref = np.zeros_like(Ac)
    for p in range(Pn):
        o, s = int(offs[p]), int(sizes[p])
        Bref[o : o + s, o : o + s] = Ac[o : o + s, o : o + s]
    assert np.linalg.norm(Dd - Bref) < 1e-10 * np.linalg.norm(Bref)

    # CustomApproximationBuilder surface: same locals wired manually
    from htool_tpu.hmatrix.assembly import HMatrixBuilder

    b = HMatrixBuilder(epsilon=1e-10, eta=10.0)
    locs = [
        b.build(gen, tree, tree, target_partition=p, source_partition=p)
        for p in range(Pn)
    ]
    dc = build_distributed_from_local_hmatrices(locs, tree, mesh)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    Bu = np.zeros_like(A)
    Bu[np.ix_(perm, perm)] = Bref
    err = np.linalg.norm(np.asarray(dc.matvec(x)) - Bu @ x)
    assert err < 1e-10 * np.linalg.norm(Bu @ x)

    # block-Jacobi-preconditioned solve of the FULL operator converges
    dfull = build_distributed_hmatrix(gen, tree, mesh=mesh, epsilon=1e-10, eta=10.0)
    ds = DistributedDDMSolver(dfull, gen, tree, schwarz="jacobi")
    bvec = np.random.default_rng(1).standard_normal(A.shape[0])
    xs, infos = ds.solve(bvec, tol=1e-6, maxiter=500, krylov="gmres")
    assert infos["Converged"]
    res = np.linalg.norm(A @ np.asarray(xs) - bvec) / np.linalg.norm(bvec)
    assert res < 1e-4


def test_dense_local_operator():
    """hmatrix_from_dense (the dense g2l local operator,
    global_to_local_operators/dense_matrix.hpp): wrap per-partition dense
    blocks and wire them as a distributed operator."""
    from htool_tpu.hmatrix.assembly import hmatrix_from_dense
    from htool_tpu.parallel import (
        build_distributed_from_local_hmatrices,
        default_mesh,
    )
    from htool_tpu.testing import grid_laplacian

    Pn = 4
    pts, A = grid_laplacian((8, 8, 4))
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=Pn)
    perm = tree.permutation
    Ac = A[np.ix_(perm, perm)]
    offs, sizes = tree.partition_offsets_sizes()

    # global wrap oracle
    Hg = hmatrix_from_dense(Ac, tree)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    assert np.allclose(np.asarray(Hg @ x), A @ x, atol=1e-10)

    # per-partition block-rows -> distributed operator == full matrix
    locs = []
    for p in range(Pn):
        o, s = int(offs[p]), int(sizes[p])
        locs.append(hmatrix_from_dense(Ac[o : o + s, :], tree, target_partition=p))
    d = build_distributed_from_local_hmatrices(locs, tree, default_mesh(Pn))
    assert np.allclose(np.asarray(d.matvec(x)), A @ x, atol=1e-10)
