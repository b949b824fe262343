"""Option registry + distributed info + GMSH loader tests."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.parallel import (
    build_distributed_hmatrix,
    default_mesh,
    distributed_hmatrix_info,
)
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric
from htool_tpu.testing.gmsh import load_gmsh_nodes
from htool_tpu.utils import SolverOptions


def test_options_parse_hpddm_style():
    o = SolverOptions.parse(
        "-hpddm_krylov_method cg -hpddm_schwarz_method asm "
        "-hpddm_schwarz_coarse_correction deflated -hpddm_geneo_nu 4 "
        "-hpddm_max_it 150 -hpddm_tol 1e-8 -hpddm_gmres_restart 25"
    )
    assert o.krylov_method == "cg"
    assert o.schwarz_method == "asm"
    assert o.schwarz_coarse_correction == "deflated"
    assert o.geneo_nu == 4
    assert o.max_it == 150
    assert o.tol == 1e-8
    assert o.solve_kwargs() == dict(tol=1e-8, maxiter=150, krylov="cg", restart=25)


def test_options_validation():
    with pytest.raises(ValueError):
        SolverOptions(krylov_method="bicgstab")
    with pytest.raises(ValueError):
        SolverOptions.parse("-hpddm_unknown_thing 3")
    with pytest.raises(ValueError):
        SolverOptions.parse("-hpddm_tol")  # missing value


def test_options_drive_solver():
    from htool_tpu.solvers import DDMSolver
    from htool_tpu.testing import grid_laplacian

    pts, A = grid_laplacian((8, 8, 6))
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=4)
    gen = ht.MatrixGenerator(A)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-10)
    o = SolverOptions.parse("-hpddm_schwarz_method ras -hpddm_tol 1e-7 -hpddm_max_it 300")
    o.overlap_radius = 1.5
    kw = o.solver_kwargs()
    kw.pop("coarse_correction")
    solver = DDMSolver(H, gen, tree, **kw)
    b = np.random.RandomState(0).randn(A.shape[0])
    x, infos = solver.solve(b, **o.solve_kwargs())
    assert infos["Converged"]
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-5


def test_distributed_info():
    P = 4
    pts = create_sphere(600)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=P)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    D = build_distributed_hmatrix(gen, tree, default_mesh(P), epsilon=1e-4)
    info = distributed_hmatrix_info(D)
    assert info["n_partitions"] == P
    assert info["compression_ratio"] > 1.0
    assert info["local_compression_ratio"]["min"] <= info["local_compression_ratio"]["max"]
    assert info["rank"]["max"] >= info["rank"]["mean"] >= info["rank"]["min"] > 0
    assert "assembly_walltime" in info


def test_gmsh_loader_v22(tmp_path):
    msh = tmp_path / "m.msh"
    msh.write_text(
        "$MeshFormat\n2.2 0 8\n$EndMeshFormat\n"
        "$Nodes\n3\n1 0 0 0\n2 1.5 0 0\n3 0 2.5 1\n$EndNodes\n"
    )
    pts = load_gmsh_nodes(str(msh))
    assert pts.shape == (3, 3)
    assert np.allclose(pts[1], [1.5, 0, 0])
    assert np.allclose(pts[2], [0, 2.5, 1])


def test_gmsh_loader_v41(tmp_path):
    msh = tmp_path / "m4.msh"
    msh.write_text(
        "$MeshFormat\n4.1 0 8\n$EndMeshFormat\n"
        "$Nodes\n1 2 1 2\n2 1 0 2\n1\n2\n0 0 0\n1 1 1\n$EndNodes\n"
    )
    pts = load_gmsh_nodes(str(msh))
    assert pts.shape == (2, 3)
    assert np.allclose(pts[1], [1, 1, 1])


def test_gmsh_loader_bad(tmp_path):
    bad = tmp_path / "x.msh"
    bad.write_text("hello\n")
    with pytest.raises(ValueError):
        load_gmsh_nodes(str(bad))
