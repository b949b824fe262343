#!/usr/bin/env python
"""Fully sharded DDM solve over a device mesh.

The production layout: the operator is row-partitioned over the mesh
(DefaultApproximationBuilder analog), and the WHOLE Krylov iteration runs
inside one shard_map — per-device vector slices, device-local Schwarz
subdomain solves, ppermute halo exchange over the overlap intersections,
psum dot products, optional GenEO two-level correction.

Run on any device count (emulates 8 CPU devices when no mesh hardware):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/use_distributed_ddm.py
"""

import jax

if jax.device_count() < 2:
    print("single device: emulating 8 CPU devices requires XLA_FLAGS, see docstring")

import numpy as np

import htool_tpu as ht
from htool_tpu.hmatrix.linalg import matvec as h_matvec
from htool_tpu.parallel import build_distributed_hmatrix, default_mesh
from htool_tpu.solvers import (
    DistributedDDMSolver,
    build_geneo_coarse_space,
    build_geometric_overlap,
)
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric


def main():
    P = min(8, jax.device_count())
    n = 4000
    print(f"devices: {P}, points: {n}")

    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=64, n_partitions=P)
    mesh = default_mesh(P)

    # row-partitioned operator: one block-row per device, sharded buckets
    D = build_distributed_hmatrix(gen, tree, mesh, epsilon=1e-6, eta=10.0)

    overlap = build_geometric_overlap(tree, 0.15)
    b = np.random.default_rng(0).standard_normal(n)

    # one-level RAS, everything sharded
    solver = DistributedDDMSolver(D, gen, tree, schwarz="ras", overlap=overlap)
    x, infos = solver.solve(b, tol=1e-6, krylov="gmres")
    print("one-level RAS:", {k: infos[k] for k in ("Nb_it", "Residual", "Converged")})

    # two-level GenEO (batched device EVPs), deflated correction
    H = ht.build_hmatrix(gen, tree, epsilon=1e-6, eta=10.0)
    coarse = build_geneo_coarse_space(
        gen, tree, overlap, lambda v: h_matvec(H, v, op="N"), nu=2, symmetry="S"
    )
    solver2 = DistributedDDMSolver(
        D, gen, tree, schwarz="ras", overlap=overlap,
        coarse=coarse, coarse_correction="deflated",
    )
    x2, infos2 = solver2.solve(b, tol=1e-6, krylov="gmres")
    print("two-level GenEO:", {k: infos2[k] for k in ("Nb_it", "Residual", "Coarse_size")})

    # block GMRES for multiple right-hand sides (shared Krylov subspace)
    B = np.random.default_rng(1).standard_normal((n, 4))
    x3, infos3 = solver.solve(B, tol=1e-6, krylov="block_gmres")
    print("block GMRES (4 rhs):", {k: infos3[k] for k in ("Nb_it", "Residual")})


if __name__ == "__main__":
    main()
