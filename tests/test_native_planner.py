"""Native (C++) planner vs NumPy planner consistency tests."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.native import native_available
from htool_tpu.testing import create_sphere
from test_clustering import check_tree_invariants

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native planner not built"
)


@pytest.mark.parametrize("n_partitions", [1, 3, 4])
@pytest.mark.parametrize("direction", ["pca", "bounding_box"])
def test_native_tree_invariants(n_partitions, direction):
    pts = create_sphere(700)
    tree = ht.ClusterTreeBuilder(
        max_leaf_size=40, direction=direction, backend="native"
    ).build(pts, n_partitions=n_partitions)
    check_tree_invariants(tree)
    assert tree.n_partitions == n_partitions


def test_native_given_partition():
    pts = create_sphere(300)
    part = np.repeat(np.arange(3), 100)
    tree = ht.ClusterTreeBuilder(max_leaf_size=20, backend="native").build(
        pts, n_partitions=3, partition=part
    )
    check_tree_invariants(tree)
    offs, sizes = tree.partition_offsets_sizes()
    for p in range(3):
        idx = tree.permutation[offs[p] : offs[p] + sizes[p]]
        assert np.all(part[idx] == p)


@pytest.mark.parametrize("symmetry,UPLO", [("N", "N"), ("S", "L"), ("H", "U")])
def test_block_plans_match(symmetry, UPLO):
    """Native and python planners produce the same leaf set on the same
    cluster tree."""
    pts = create_sphere(900)
    tree = ht.ClusterTreeBuilder(max_leaf_size=35, backend="native").build(
        pts, n_partitions=2
    )

    def leafset(plan):
        key = lambda l: (l.t_off, l.t_size, l.s_off, l.s_size, l.mirror)
        return (
            sorted(map(key, plan.dense)),
            sorted(map(key, plan.admissible)),
        )

    kw = dict(epsilon=1e-4, eta=10.0, symmetry=symmetry, UPLO=UPLO)
    pn = ht.plan_block_tree(tree, backend="native", **kw)
    pp = ht.plan_block_tree(tree, backend="python", **kw)
    assert leafset(pn) == leafset(pp)
    # partition-restricted plans too
    pn1 = ht.plan_block_tree(tree, target_partition=1, backend="native", **kw)
    pp1 = ht.plan_block_tree(tree, target_partition=1, backend="python", **kw)
    assert leafset(pn1) == leafset(pp1)
