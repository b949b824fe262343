"""Solver tests — residual oracle ‖f − A·x‖/‖f‖ < tol across
no-precond / jacobi / ASM / RAS × one-level / two-level, mirroring the
reference solver test grid (tests/functional_tests/solvers/
test_solver_ddm.hpp:211-217, test_solver_double.cpp:28-58).

The DDM-stressing problem is a 3-D grid Laplacian (condition O(h⁻²)) — the
in-repo analog of the reference's discretized-PDE golden data."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.solvers import (
    DDMSolver,
    build_geneo_coarse_space,
    build_geometric_overlap,
    cg,
    gmres,
)
from htool_tpu.testing import create_sphere, grid_laplacian, laplace_kernel_symmetric

TOL = 1e-6


def build_grid_problem(shape=(9, 9, 8), P=4):
    pts, A = grid_laplacian(shape)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=P)
    gen = ht.MatrixGenerator(A)
    return pts, tree, gen, A


def check_residual(A, x, b):
    return np.linalg.norm(A @ np.asarray(x) - b.reshape(np.asarray(x).shape)) / np.linalg.norm(b)


@pytest.mark.parametrize("krylov", ["cg", "gmres"])
@pytest.mark.parametrize("schwarz", ["none", "jacobi", "asm", "ras"])
@pytest.mark.parametrize("nrhs", [1, 3])
def test_one_level_solve_grid(krylov, schwarz, nrhs):
    pts, tree, gen, A = build_grid_problem()
    rng = np.random.RandomState(0)
    b = rng.randn(A.shape[0], nrhs)
    if nrhs == 1:
        b = b[:, 0]
    # operator: H-matrix of the (sparse) grid Laplacian at tight epsilon
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    solver = DDMSolver(H, gen, tree, schwarz=schwarz, overlap_radius=1.5)
    x, infos = solver.solve(b, tol=TOL, maxiter=500, krylov=krylov)
    assert infos["Converged"], infos
    assert check_residual(A, x, b) < 100 * TOL

    if schwarz in ("asm", "ras"):
        solver0 = DDMSolver(H, gen, tree, schwarz="none")
        _, infos0 = solver0.solve(b, tol=TOL, maxiter=500, krylov=krylov)
        assert infos["Nb_it"] < infos0["Nb_it"], (infos, infos0)


def test_kernel_matrix_solve():
    """BEM-like kernel system (the reference example flow,
    examples/use_ddm_solver.cpp:59-136)."""
    pts = create_sphere(600)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=4)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-6, eta=10.0)
    A = np.asarray(gen.to_dense())
    b = np.random.RandomState(0).randn(600)
    solver = DDMSolver(H, gen, tree, schwarz="ras", overlap_radius=0.2)
    x, infos = solver.solve(b, tol=TOL, maxiter=300, krylov="cg")
    assert infos["Converged"]
    assert check_residual(A, x, b) < 50 * TOL


@pytest.mark.slow
def test_two_level_geneo():
    pts, tree, gen, A = build_grid_problem(shape=(10, 10, 8), P=8)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    from htool_tpu.hmatrix.linalg import matvec as h_matvec

    overlap = build_geometric_overlap(tree, 1.5)
    A_apply = lambda x: h_matvec(H, x, op="N")
    coarse = build_geneo_coarse_space(gen, tree, overlap, A_apply, nu=4, symmetry="S")
    assert coarse.size == 32

    b = np.random.RandomState(1).randn(A.shape[0])
    solver1 = DDMSolver(H, gen, tree, schwarz="ras", overlap=overlap)
    _, infos1 = solver1.solve(b, tol=TOL, maxiter=500, krylov="gmres")

    results = {}
    for correction in ["additive", "deflated", "balanced"]:
        solver = DDMSolver(
            H,
            gen,
            tree,
            schwarz="ras",
            overlap=overlap,
            coarse=coarse,
            coarse_correction=correction,
        )
        x, infos = solver.solve(b, tol=TOL, maxiter=500, krylov="gmres")
        assert infos["Converged"], (correction, infos)
        assert check_residual(A, x, b) < 100 * TOL
        results[correction] = infos["Nb_it"]

    # the coarse space must reduce iteration counts vs one-level RAS
    assert min(results.values()) < infos1["Nb_it"], (results, infos1["Nb_it"])


@pytest.mark.slow
def test_solve_with_distributed_operator():
    from htool_tpu.parallel import build_distributed_hmatrix, default_mesh

    P = 4
    pts, A = grid_laplacian((8, 8, 8))
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=P)
    gen = ht.MatrixGenerator(A)
    D = build_distributed_hmatrix(gen, tree, default_mesh(P), epsilon=1e-10, eta=10.0)
    b = np.random.RandomState(2).randn(A.shape[0])
    solver = DDMSolver(D, gen, tree, schwarz="ras", overlap_radius=1.5)
    x, infos = solver.solve(b, tol=TOL, maxiter=400, krylov="gmres")
    assert infos["Converged"]
    assert check_residual(A, x, b) < 100 * TOL


def test_krylov_standalone():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n = 80
    Q = np.linalg.qr(rng.randn(n, n))[0]
    A = Q @ np.diag(np.linspace(1, 30, n)) @ Q.T
    b = rng.randn(n)
    r1 = cg(lambda x: jnp.asarray(A) @ x, b, tol=1e-10, maxiter=300)
    assert bool(r1.converged) and float(r1.residual) < 1e-9
    C = A + 0.2 * rng.randn(n, n)
    r2 = gmres(lambda x: jnp.asarray(C) @ x, b, tol=1e-10, maxiter=300, restart=40)
    assert bool(r2.converged)
    assert np.linalg.norm(C @ np.asarray(r2.x) - b) / np.linalg.norm(b) < 1e-9


def test_geneo_batched_matches_scipy():
    """The batched device EVP path (Cholesky transform + batched eigh,
    coarse_space_builder.hpp:89-92 reduction) must produce the same
    per-subdomain eigenspaces as host scipy eigh."""
    import scipy.linalg as sla

    pts, tree, gen, A = build_grid_problem(shape=(10, 10, 8), P=8)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    from htool_tpu.hmatrix.linalg import matvec as h_matvec

    overlap = build_geometric_overlap(tree, 1.5)
    infos = {}
    cs = build_geneo_coarse_space(
        gen, tree, overlap, lambda x: h_matvec(H, x, op="N"), nu=4,
        symmetry="S", infos=infos,
    )
    assert "GenEO_geev_walltime" in infos
    offs, sizes = tree.partition_offsets_sizes()
    perm = tree.permutation
    Z = np.asarray(cs.Z)
    col = 0
    for p in range(tree.n_partitions):
        off, sz = int(offs[p]), int(sizes[p])
        idx = np.concatenate([np.arange(off, off + sz), overlap[p]])
        rows_user = perm[idx]
        Ai = A[np.ix_(rows_user, rows_user)]
        DAiD = np.zeros_like(Ai)
        DAiD[:sz, :sz] = Ai[:sz, :sz]
        w, v = sla.eigh(DAiD, Ai)
        order = np.argsort(-np.abs(w))[:4]
        q1, _ = np.linalg.qr(v[:sz, order])
        q2, _ = np.linalg.qr(Z[off : off + sz, col : col + 4])
        s = np.linalg.svd(q1.T @ q2, compute_uv=False)
        assert 1 - s.min() < 1e-8, (p, s)
        col += 4


def test_block_gmres_shares_subspace():
    """TRUE block GMRES (HPDDM's block methods behind ddm.hpp:193): at mu=5
    the shared subspace must converge in fewer block iterations (= operator
    applications) than the column-wise gmres."""
    from htool_tpu.hmatrix.linalg import matvec as h_matvec
    from htool_tpu.solvers.krylov import block_gmres, gmres

    import jax.numpy as jnp

    pts, tree, gen, A = build_grid_problem(shape=(10, 10, 8), P=4)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    Aap = lambda x: h_matvec(H, x, op="N")
    perm = tree.permutation
    b = np.random.default_rng(0).standard_normal((A.shape[0], 5))
    bc = jnp.asarray(b[perm])
    r_col = gmres(Aap, bc, tol=1e-8, maxiter=500, restart=40)
    r_blk = block_gmres(Aap, bc, tol=1e-8, maxiter=500, restart=40)
    assert bool(r_blk.converged)
    assert int(r_blk.iterations) < int(r_col.iterations), (
        int(r_blk.iterations), int(r_col.iterations))
    Ac = A[np.ix_(perm, perm)]
    res = np.linalg.norm(Ac @ np.asarray(r_blk.x) - np.asarray(bc)) / np.linalg.norm(b)
    assert res < 1e-7


@pytest.mark.slow
def test_block_gmres_in_ddm_solvers():
    """block_gmres is selectable in both solver drivers."""
    pts, tree, gen, A = build_grid_problem(shape=(8, 8, 8), P=4)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    b = np.random.default_rng(2).standard_normal((A.shape[0], 4))
    solver = DDMSolver(H, gen, tree, schwarz="ras", overlap_radius=1.5)
    x, infos = solver.solve(b, tol=TOL, maxiter=300, krylov="block_gmres")
    assert infos["Converged"]
    assert check_residual(A, x, b) < 100 * TOL

    from htool_tpu.parallel import build_distributed_hmatrix, default_mesh
    from htool_tpu.solvers import DistributedDDMSolver, build_geometric_overlap

    mesh = default_mesh(4)
    dop = build_distributed_hmatrix(gen, tree, mesh=mesh, epsilon=1e-10, eta=10.0)
    overlap = build_geometric_overlap(tree, 1.5)
    ds = DistributedDDMSolver(dop, gen, tree, schwarz="ras", overlap=overlap)
    xd, infod = ds.solve(b, tol=TOL, maxiter=300, krylov="block_gmres")
    assert infod["Converged"]
    assert check_residual(A, xd, b) < 100 * TOL
