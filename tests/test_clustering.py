"""Cluster-tree tests — invariants mirrored from the reference's clustering
functional tests (tests/functional_tests/clustering/)."""

import numpy as np
import pytest

from htool_tpu import ClusterTreeBuilder, build_cluster_tree
from htool_tpu.testing import create_sphere


def check_tree_invariants(tree):
    # permutation is a bijection
    assert np.array_equal(np.sort(tree.permutation), np.arange(tree.n_points))
    # root spans everything
    assert tree.offsets[0] == 0 and tree.sizes[0] == tree.n_points
    for n in range(tree.n_nodes):
        kids = tree.node_children(n)
        if len(kids):
            # children partition the parent's range, in order
            assert tree.offsets[kids[0]] == tree.offsets[n]
            acc = tree.offsets[n]
            for c in kids:
                assert tree.offsets[c] == acc
                acc += tree.sizes[c]
            assert acc == tree.offsets[n] + tree.sizes[n]
        else:
            pass
        # radius covers all points of the node
        idx = tree.permutation[tree.offsets[n] : tree.offsets[n] + tree.sizes[n]]
        d = np.linalg.norm(tree.points[idx] - tree.centers[n], axis=1)
        assert d.max() <= tree.radii[n] + 1e-12


@pytest.mark.parametrize("n_children", [2, 3])
@pytest.mark.parametrize("direction", ["pca", "bounding_box"])
@pytest.mark.parametrize("splitting", ["regular", "geometric"])
def test_cluster_tree_build(n_children, direction, splitting):
    pts = create_sphere(500)
    tree = ClusterTreeBuilder(
        max_leaf_size=30,
        n_children=n_children,
        direction=direction,
        splitting=splitting,
    ).build(pts)
    check_tree_invariants(tree)
    # leaves should respect max size when splitting succeeded
    leaf_sizes = [
        tree.sizes[n] for n in range(tree.n_nodes) if tree.is_leaf(n)
    ]
    if splitting == "regular":
        assert max(leaf_sizes) <= 30


@pytest.mark.parametrize("n_partitions", [1, 2, 3, 4])
def test_simple_partition(n_partitions):
    pts = create_sphere(400)
    tree = build_cluster_tree(pts, max_leaf_size=25, n_partitions=n_partitions)
    check_tree_invariants(tree)
    assert tree.n_partitions == n_partitions
    offs, sizes = tree.partition_offsets_sizes()
    # partitions tile [0, N)
    order = np.argsort(offs)
    assert offs[order[0]] == 0
    assert np.all(offs[order][1:] == (offs + sizes)[order][:-1])
    assert (offs + sizes)[order[-1]] == tree.n_points
    # every partition root has the right rank
    for p in range(n_partitions):
        assert tree.ranks[tree.partition_roots[p]] == p


def test_given_global_partition():
    pts = create_sphere(300)
    part = np.repeat(np.arange(3), 100)
    tree = build_cluster_tree(pts, max_leaf_size=20, n_partitions=3, partition=part)
    check_tree_invariants(tree)
    offs, sizes = tree.partition_offsets_sizes()
    assert list(sizes) == [100, 100, 100]
    # permutation groups points by partition id
    for p in range(3):
        idx = tree.permutation[offs[p] : offs[p] + sizes[p]]
        assert np.all(part[idx] == p)
    assert tree.is_permutation_local  # contiguous given partition


def test_given_local_partition():
    pts = create_sphere(300)
    pairs = np.array([[0, 120], [120, 80], [200, 100]])
    tree = build_cluster_tree(
        pts, max_leaf_size=20, n_partitions=3, partition=pairs, is_partition_local=True
    )
    check_tree_invariants(tree)
    offs, sizes = tree.partition_offsets_sizes()
    assert list(offs) == [0, 120, 200]
    assert list(sizes) == [120, 80, 100]


def test_permutation_roundtrip():
    pts = create_sphere(200)
    tree = build_cluster_tree(pts, max_leaf_size=16)
    x = np.random.RandomState(3).randn(200)
    assert np.allclose(tree.cluster_to_user(tree.user_to_cluster(x)), x)
    assert np.allclose(tree.user_to_cluster(tree.cluster_to_user(x)), x)


@pytest.mark.parametrize("direction", ["pca", "bounding_box"])
@pytest.mark.parametrize("n_partitions", [4, 6, 8])
def test_multi_axis_partitioning(direction, n_partitions):
    """Partitioning_N (partitioning.hpp:38-157): split over several
    directions at once, decomposition chosen by aspect-ratio cost."""
    rng = np.random.RandomState(0)
    # anisotropic slab: x-extent 4, y-extent 2, z-extent thin
    pts = rng.rand(800, 3) * np.array([4.0, 2.0, 0.05])
    tree = ClusterTreeBuilder(
        max_leaf_size=40, direction=direction, strategy="multi_axis"
    ).build(pts, n_partitions=n_partitions)
    check_tree_invariants(tree)
    assert tree.n_partitions == n_partitions
    offs, szs = tree.partition_offsets_sizes()
    assert szs.sum() == 800 and np.all(szs > 0)
    # multi-axis should produce boxier partitions than a pure 1-D slicing:
    # every partition's extent along x must be well below the full 4.0 when
    # the decomposition uses >1 direction (e.g. 4 = 2x2 on this slab)
    if n_partitions == 4:
        for p in range(n_partitions):
            idx = tree.permutation[offs[p] : offs[p] + szs[p]]
            ext = tree.points[idx].max(axis=0) - tree.points[idx].min(axis=0)
            assert ext[0] < 3.0  # a 1-D split into 4 would give ~1.0; 2x2 gives ~2.0


def test_multi_axis_integer_decompositions():
    from htool_tpu.clustering.cluster_tree import (
        _best_splitting_counts,
        _integer_decompositions,
    )

    decs = _integer_decompositions(12, 2)
    assert [12, 1] in decs and [6, 2] in decs and [4, 3] in decs
    assert all(a >= b for a, b in decs)
    # isotropic weights: pick the most balanced decomposition
    counts = _best_splitting_counts(4, np.array([1.0, 1.0, 1e-20]))
    assert counts == [2, 2]
    # strongly anisotropic: put all splits on the big axis
    counts = _best_splitting_counts(4, np.array([100.0, 1.0, 1e-20]))
    assert counts == [4, 1]
