#!/usr/bin/env python
"""Distributed operator example (examples/use_distributed_operator.cpp
analog): row-partitioned H-matrix over a device mesh, g2g and l2l products.

Run with emulated devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/use_distributed_operator.py
"""

import jax
import numpy as np

import htool_tpu as ht
from htool_tpu.parallel import build_distributed_hmatrix, default_mesh
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric


def main():
    P = min(4, jax.device_count())
    n = 4000
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=100, n_partitions=P)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    D = build_distributed_hmatrix(gen, tree, default_mesh(P), epsilon=1e-3, eta=10.0)
    print(f"devices={P} partition sizes={D.part_sizes.tolist()}")

    x = np.random.RandomState(0).randn(n)
    y = np.asarray(D.matvec(x))          # global-to-global
    yt = np.asarray(D.matvec(x, op="T"))
    y_loc = D.matvec_local(D.to_local_layout(x[np.asarray(tree.permutation)]))
    print("|A x| =", np.linalg.norm(y), " |A^T x| =", np.linalg.norm(yt))
    print("l2l == g2g:", np.allclose(
        np.asarray(D.to_global_layout(y_loc)),
        np.asarray(y)[np.asarray(tree.permutation)], atol=1e-10 * np.linalg.norm(y)))


if __name__ == "__main__":
    main()
