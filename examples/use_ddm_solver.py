#!/usr/bin/env python
"""Full DDM pipeline (examples/use_ddm_solver.cpp:59-136 analog): sphere →
cluster tree → H-matrix → CG/GMRES with RAS and two-level GenEO."""

import numpy as np

import htool_tpu as ht
from htool_tpu.hmatrix.linalg import matvec as h_matvec
from htool_tpu.solvers import (
    DDMSolver,
    build_geneo_coarse_space,
    build_geometric_overlap,
)
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric


def main():
    n, P = 4000, 8
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=100, n_partitions=P)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-4, eta=10.0)
    b = np.random.RandomState(0).randn(n)

    solver = DDMSolver(H, gen, tree, schwarz="ras", overlap_radius=0.15)
    x, infos = solver.solve(b, tol=1e-6, maxiter=200, krylov="cg")
    print("one-level RAS + CG:", {k: infos[k] for k in ("Nb_it", "Residual", "Converged")})

    overlap = build_geometric_overlap(tree, 0.15)
    coarse = build_geneo_coarse_space(
        gen, tree, overlap, lambda v: h_matvec(H, v), nu=2, symmetry="S"
    )
    solver2 = DDMSolver(
        H, gen, tree, schwarz="ras", overlap=overlap,
        coarse=coarse, coarse_correction="deflated",
    )
    x2, infos2 = solver2.solve(b, tol=1e-6, maxiter=200, krylov="gmres")
    print("two-level GenEO + GMRES:", {k: infos2[k] for k in ("Nb_it", "Residual", "Converged")})


if __name__ == "__main__":
    main()
