#!/usr/bin/env python
"""Cluster-tree example (examples/use_clustering.cpp analog): build a PCA
cluster tree over a sphere, save it, reload it, dump the clustered
geometry for plotting."""

import os
import numpy as np

import htool_tpu as ht
from htool_tpu.clustering.io import (
    read_cluster_tree,
    save_cluster_tree,
    save_clustered_geometry,
)
from htool_tpu.testing import create_sphere


def main(outdir="."):
    pts = create_sphere(2000)
    tree = ht.build_cluster_tree(pts, max_leaf_size=100, n_partitions=4)
    print(f"nodes={tree.n_nodes} partitions={tree.n_partitions}")
    offs, sizes = tree.partition_offsets_sizes()
    print("partition sizes:", sizes.tolist())

    prefix = os.path.join(outdir, "sphere")
    save_cluster_tree(tree, prefix)
    tree2 = read_cluster_tree(prefix, pts)
    assert np.array_equal(tree.permutation, tree2.permutation)
    save_clustered_geometry(tree, 2, os.path.join(outdir, "sphere_clustered.csv"))
    print("saved:", prefix + "_*.csv", "and sphere_clustered.csv")
    print("plot with: python tools/plot_cluster.py sphere_clustered.csv")


if __name__ == "__main__":
    main()
