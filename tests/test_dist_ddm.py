"""Fully distributed DDM solve tests — the sharded analog of the
reference's solver grid (tests/functional_tests/solvers/test_solver_ddm.hpp
sweeps precond x correction over mpiexec -np {1..4}).  Oracle = (a) the
replicated DDMSolver's iteration counts/residuals must be reproduced
exactly, (b) the true residual against the dense matrix."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.linalg import matvec as h_matvec
from htool_tpu.parallel import build_distributed_hmatrix, default_mesh
from htool_tpu.solvers import (
    DDMSolver,
    DistributedDDMSolver,
    build_geneo_coarse_space,
    build_geometric_overlap,
    build_halo_exchange,
)
from htool_tpu.testing import create_sphere, grid_laplacian, laplace_kernel_symmetric

# full grids / large n: default CI tier skips these (pytest -m 'not slow')
pytestmark = pytest.mark.slow

TOL = 1e-6


@pytest.fixture(scope="module")
def grid_case():
    Pn = 8
    pts, A = grid_laplacian((10, 10, 8))
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=Pn)
    gen = ht.MatrixGenerator(A)
    mesh = default_mesh(Pn)
    dop = build_distributed_hmatrix(gen, tree, mesh=mesh, epsilon=1e-10, eta=10.0)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10, eta=10.0)
    overlap = build_geometric_overlap(tree, 1.5)
    b = np.random.RandomState(1).randn(A.shape[0])
    return dict(tree=tree, gen=gen, A=A, dop=dop, H=H, overlap=overlap, b=b)


def test_halo_exchange_plan(grid_case):
    """The colored exchange must deliver exactly the owners' interior values
    into each subdomain's overlap positions."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    tree, overlap = grid_case["tree"], grid_case["overlap"]
    halo = build_halo_exchange(tree, overlap)
    dop = grid_case["dop"]
    mesh, ax = dop.mesh, dop.axis_name
    N = tree.n_points
    rng = np.random.RandomState(0)
    xc = rng.randn(N, 2)
    x_loc = np.asarray(dop.to_local_layout(jnp.asarray(xc)))

    from htool_tpu.solvers.dist_ddm import _halo_gather

    def f(x_sl, send_idx, recv_pos, ext_src):
        return _halo_gather(
            halo, ax, x_sl, send_idx[:, 0], recv_pos[:, 0], ext_src[0]
        )

    x_ext = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(ax), P(None, ax), P(None, ax), P(ax)),
        out_specs=P(ax),
        check_vma=False,
    )(jnp.asarray(x_loc), halo.send_idx, halo.recv_pos, halo.ext_src)
    x_ext = np.asarray(x_ext).reshape(tree.n_partitions, halo.n_ext_max, 2)

    offs, sizes = tree.partition_offsets_sizes()
    for p in range(tree.n_partitions):
        off, sz = int(offs[p]), int(sizes[p])
        idx = np.concatenate([np.arange(off, off + sz), overlap[p]])
        assert np.allclose(x_ext[p, : idx.size], xc[idx]), p
        assert np.allclose(x_ext[p, idx.size :], 0.0)


@pytest.mark.parametrize("krylov", ["cg", "gmres"])
@pytest.mark.parametrize("schwarz", ["none", "jacobi", "asm", "ras"])
def test_dist_matches_replicated(grid_case, krylov, schwarz):
    c = grid_case
    ov = c["overlap"] if schwarz in ("asm", "ras") else None
    ref = DDMSolver(c["H"], c["gen"], c["tree"], schwarz=schwarz, overlap=ov)
    _, infos_ref = ref.solve(c["b"], tol=TOL, maxiter=500, krylov=krylov)
    ds = DistributedDDMSolver(c["dop"], c["gen"], c["tree"], schwarz=schwarz,
                              overlap=ov)
    x, infos = ds.solve(c["b"], tol=TOL, maxiter=500, krylov=krylov)
    assert infos["Converged"], infos
    assert infos["Nb_it"] == infos_ref["Nb_it"], (infos, infos_ref)
    res = np.linalg.norm(c["A"] @ np.asarray(x) - c["b"]) / np.linalg.norm(c["b"])
    assert res < 100 * TOL


def test_dist_blr_local_solver(grid_case):
    """Compressed per-device subdomain solves (LocalHMatrixSolver mode) must
    reproduce the dense-local-solver iteration counts."""
    c = grid_case
    dense = DistributedDDMSolver(c["dop"], c["gen"], c["tree"], schwarz="ras",
                                 overlap=c["overlap"], local_solver="dense")
    _, i_dense = dense.solve(c["b"], tol=TOL, maxiter=500, krylov="gmres")
    blr = DistributedDDMSolver(c["dop"], c["gen"], c["tree"], schwarz="ras",
                               overlap=c["overlap"], local_solver="blr",
                               blr_epsilon=1e-8, blr_block_size=64)
    x, i_blr = blr.solve(c["b"], tol=TOL, maxiter=500, krylov="gmres")
    assert i_blr["Converged"]
    assert i_blr["Nb_it"] == i_dense["Nb_it"], (i_blr, i_dense)
    res = np.linalg.norm(c["A"] @ np.asarray(x) - c["b"]) / np.linalg.norm(c["b"])
    assert res < 100 * TOL


@pytest.mark.parametrize("correction", ["additive", "deflated", "balanced"])
def test_dist_two_level_geneo(grid_case, correction):
    c = grid_case
    A_apply = lambda x: h_matvec(c["H"], x, op="N")
    coarse = build_geneo_coarse_space(c["gen"], c["tree"], c["overlap"],
                                      A_apply, nu=4, symmetry="S")
    ref = DDMSolver(c["H"], c["gen"], c["tree"], schwarz="ras",
                    overlap=c["overlap"], coarse=coarse,
                    coarse_correction=correction)
    _, i_ref = ref.solve(c["b"], tol=TOL, maxiter=500, krylov="gmres")
    ds = DistributedDDMSolver(c["dop"], c["gen"], c["tree"], schwarz="ras",
                              overlap=c["overlap"], coarse=coarse,
                              coarse_correction=correction)
    x, infos = ds.solve(c["b"], tol=TOL, maxiter=500, krylov="gmres")
    assert infos["Converged"]
    assert infos["Nb_it"] == i_ref["Nb_it"], (infos, i_ref)
    res = np.linalg.norm(c["A"] @ np.asarray(x) - c["b"]) / np.linalg.norm(c["b"])
    assert res < 100 * TOL


def test_dist_kernel_matrix_multi_rhs():
    """BEM-like kernel flow (examples/use_ddm_solver.cpp) with multiple
    right-hand sides on a 4-device mesh."""
    Pn, n = 4, 1200
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=Pn)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    mesh = default_mesh(Pn)
    dop = build_distributed_hmatrix(gen, tree, mesh=mesh, epsilon=1e-6, eta=10.0)
    A = np.asarray(gen.to_dense())
    overlap = build_geometric_overlap(tree, 0.2)
    b = np.random.RandomState(0).randn(n, 3)
    ds = DistributedDDMSolver(dop, gen, tree, schwarz="ras", overlap=overlap)
    x, infos = ds.solve(b, tol=TOL, maxiter=300, krylov="cg")
    assert infos["Converged"]
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 100 * TOL


def test_per_device_memory_scaling(grid_case):
    """Preconditioner state is O(N/P + halo) per device and sharded."""
    c = grid_case
    ds = DistributedDDMSolver(c["dop"], c["gen"], c["tree"], schwarz="ras",
                              overlap=c["overlap"])
    halo = ds.halo
    N = c["tree"].n_points
    Pn = c["tree"].n_partitions
    assert halo.n_ext_max < N / 2
    assert ds._lu.shape == (Pn, halo.n_ext_max, halo.n_ext_max)
    assert len(ds._lu.sharding.device_set) == Pn


@pytest.mark.parametrize("correction", ["additive", "deflated", "balanced"])
def test_dist_two_level_geneo_sharded_store(grid_case, correction):
    """store='local' GenEO (VERDICT r3 item 9): no [N, nc] basis is ever
    materialized — Z stays as per-partition column blocks, E is assembled
    by partition-chunked sub-products, and the sharded solver embeds the
    per-device mu at its slot offset.  Iteration counts must match the
    replicated store exactly."""
    c = grid_case
    A_apply = lambda x: h_matvec(c["H"], x, op="N")
    cs_rep = build_geneo_coarse_space(c["gen"], c["tree"], c["overlap"],
                                      A_apply, nu=4, symmetry="S")
    cs_loc = build_geneo_coarse_space(c["gen"], c["tree"], c["overlap"],
                                      A_apply, nu=4, symmetry="S",
                                      store="local")
    assert cs_loc.Z is None and cs_loc.Z_loc is not None
    assert cs_loc.size == cs_rep.size
    # the coarse correction operator agrees between the stores
    r = np.random.RandomState(3).randn(c["A"].shape[0], 2)
    q_rep = np.asarray(cs_rep.coarse_solve(r))
    q_loc = np.asarray(cs_loc.coarse_solve(r))
    assert np.linalg.norm(q_rep - q_loc) / np.linalg.norm(q_rep) < 1e-5

    ref = DDMSolver(c["H"], c["gen"], c["tree"], schwarz="ras",
                    overlap=c["overlap"], coarse=cs_rep,
                    coarse_correction=correction)
    _, i_ref = ref.solve(c["b"], tol=TOL, maxiter=500, krylov="gmres")
    ds = DistributedDDMSolver(c["dop"], c["gen"], c["tree"], schwarz="ras",
                              overlap=c["overlap"], coarse=cs_loc,
                              coarse_correction=correction)
    x, infos = ds.solve(c["b"], tol=TOL, maxiter=500, krylov="gmres")
    assert infos["Converged"]
    assert infos["Nb_it"] == i_ref["Nb_it"], (infos, i_ref)
    res = np.linalg.norm(c["A"] @ np.asarray(x) - c["b"]) / np.linalg.norm(c["b"])
    assert res < 100 * TOL


def test_geneo_evp_chunking_matches(grid_case):
    """A tiny EVP workspace budget forces many chunks; the coarse space
    must be identical to the single-batch build."""
    c = grid_case
    A_apply = lambda x: h_matvec(c["H"], x, op="N")
    cs1 = build_geneo_coarse_space(c["gen"], c["tree"], c["overlap"],
                                   A_apply, nu=3, symmetry="S")
    cs2 = build_geneo_coarse_space(c["gen"], c["tree"], c["overlap"],
                                   A_apply, nu=3, symmetry="S",
                                   evp_budget_bytes=1)  # 1 subdomain/chunk
    assert cs2.size == cs1.size
    r = np.random.RandomState(5).randn(c["A"].shape[0], 2)
    q1 = np.asarray(cs1.coarse_solve(r))
    q2 = np.asarray(cs2.coarse_solve(r))
    assert np.linalg.norm(q1 - q2) / np.linalg.norm(q1) < 1e-5
