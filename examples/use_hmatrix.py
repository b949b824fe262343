#!/usr/bin/env python
"""H-matrix example (examples/use_hmatrix.cpp analog): compress a Laplace
kernel matrix on a sphere, check the error, print info, dump the block
structure."""

import os
import numpy as np

import htool_tpu as ht
from htool_tpu.hmatrix.output import save_leaves_with_rank
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric


def main(outdir="."):
    n = 5000
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=100)
    H = ht.build_hmatrix(
        gen, tree, epsilon=1e-3, eta=10.0, symmetry="S", UPLO="L"
    )
    ht.print_hmatrix_information(H)

    x = np.random.RandomState(0).randn(n)
    y = np.asarray(H @ x)
    print("matvec done, |y| =", np.linalg.norm(y))

    save_leaves_with_rank(H, os.path.join(outdir, "hmatrix_leaves.csv"))
    print("plot with: python tools/plot_hmatrix.py hmatrix_leaves.csv")


if __name__ == "__main__":
    main()
