"""Fused Pallas bucket-matvec kernels vs the dense oracle (interpret mode).

Exercises htool_tpu/ops/bucket_matvec.py on CPU via the Pallas interpreter —
the same code path the TPU runs compiled.  Oracle pattern follows the
reference build/product tests (test_hmatrix_build.hpp:135-209): compare
against the densified operator with relative-error tolerance.
"""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

# full grids / large n: default CI tier skips these (pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture
def pallas_interpret(monkeypatch):
    import jax

    monkeypatch.setenv("HTOOL_TPU_PALLAS", "interpret")
    jax.clear_caches()
    yield
    monkeypatch.delenv("HTOOL_TPU_PALLAS", raising=False)
    jax.clear_caches()


def _check(H, n, ops=("N", "T"), k=3, tol=None):
    from htool_tpu.hmatrix.linalg import matvec_user

    A = H.to_dense()
    rng = np.random.RandomState(7)
    x = rng.randn(n, k).astype(np.float32)
    for op in ops:
        ref = {"N": A, "T": A.T}[op] @ x
        got = np.asarray(matvec_user(H, x, op=op))
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert err < (tol or 1e-5), (op, err)


def test_pallas_matvec_matches_dense(pallas_interpret):
    n = 500
    pts = create_sphere(n).astype(np.float32)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0)
    assert len(H.lr_buckets) > 0 and len(H.dense_buckets) > 0
    _check(H, n)


def test_pallas_matvec_symmetric_mirror(pallas_interpret):
    n = 400
    pts = create_sphere(n).astype(np.float32)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0, symmetry="S", UPLO="L")
    assert any(b.mirror for b in H.dense_buckets + H.lr_buckets)
    _check(H, n)


def test_pallas_and_xla_paths_agree(monkeypatch):
    import jax

    n = 300
    pts = create_sphere(n).astype(np.float32)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-4, eta=10.0)
    x = np.random.RandomState(3).randn(n, 2).astype(np.float32)

    monkeypatch.setenv("HTOOL_TPU_PALLAS", "0")
    jax.clear_caches()
    y_xla = np.asarray(H @ x)

    monkeypatch.setenv("HTOOL_TPU_PALLAS", "interpret")
    jax.clear_caches()
    y_pl = np.asarray(H @ x)
    jax.clear_caches()

    np.testing.assert_allclose(y_pl, y_xla, rtol=2e-5, atol=1e-6)


# ======================================================================
# tiled kernels (ops/tiled_matvec.py) — the beyond-VMEM-wall path
# ======================================================================


def _force_tiled(monkeypatch):
    """Disable the resident kernels so products exercise the tiled path."""
    import htool_tpu.hmatrix.linalg as L

    monkeypatch.setattr(L, "pallas_matvec_ok", lambda *a, **k: False)


def test_tiled_matvec_matches_dense(pallas_interpret, monkeypatch):
    from htool_tpu.hmatrix.linalg import prepare_tiled_matvec

    _force_tiled(monkeypatch)
    n = 700
    pts = create_sphere(n).astype(np.float32)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0)
    # small tiles so blocks straddle tile boundaries (extension-zone path)
    prepare_tiled_matvec(H, tile_rows=128)
    assert all(b.plan_t is not None for b in H.dense_buckets + H.lr_buckets)
    _check(H, n)


def test_tiled_matvec_symmetric_mirror(pallas_interpret, monkeypatch):
    from htool_tpu.hmatrix.linalg import prepare_tiled_matvec

    _force_tiled(monkeypatch)
    n = 700
    pts = create_sphere(n).astype(np.float32)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0, symmetry="S", UPLO="L")
    prepare_tiled_matvec(H, tile_rows=128)
    _check(H, n)


def test_tiled_matvec_multi_rhs_and_single(pallas_interpret, monkeypatch):
    from htool_tpu.hmatrix.linalg import matvec_user, prepare_tiled_matvec

    _force_tiled(monkeypatch)
    n = 500
    pts = create_sphere(n).astype(np.float32)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    tree = ht.build_cluster_tree(pts, max_leaf_size=32)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0)
    prepare_tiled_matvec(H, tile_rows=256)
    A = H.to_dense()
    rng = np.random.RandomState(3)
    for k in (1, 5):
        x = rng.randn(n, k).astype(np.float32)
        got = np.asarray(matvec_user(H, x))
        err = np.linalg.norm(got - A @ x) / np.linalg.norm(A @ x)
        assert err < 1e-5, (k, err)
    # 1-D input round-trips
    x1 = rng.randn(n).astype(np.float32)
    got1 = np.asarray(H @ x1)
    assert np.linalg.norm(got1 - A @ x1) / np.linalg.norm(A @ x1) < 1e-5


def test_tiled_complex_matvec_matches_dense(pallas_interpret):
    """Complex64 fast path: re/im plane plans with RHS stacking vs the dense
    oracle, ops N/T/C and hermitian mirror storage (the reference's complex
    kernels are first-class, generator_test.hpp:163-205)."""
    import jax.numpy as jnp

    from htool_tpu.hmatrix.linalg import matvec_user, prepare_tiled_matvec
    from htool_tpu.testing import laplace_kernel_complex_symmetric

    n = 1200
    pts = create_sphere(n)
    gen = ht.KernelGenerator(
        laplace_kernel_complex_symmetric, pts, pts, dtype=jnp.complex64
    )
    tree = ht.build_cluster_tree(pts, max_leaf_size=64)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0)
    prepare_tiled_matvec(H)
    from htool_tpu.ops.tiled_matvec import ComplexPlans

    for b in H.dense_buckets + H.lr_buckets:
        assert isinstance(b.plan_t, ComplexPlans)

    A = H.to_dense()
    rng = np.random.RandomState(7)
    x = (rng.randn(n, 3) + 1j * rng.randn(n, 3)).astype(np.complex64)
    for op, ref in (("N", A @ x), ("T", A.T @ x), ("C", A.conj().T @ x)):
        got = np.asarray(matvec_user(H, x, op=op))
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert err < 1e-4, (op, err)


def test_tiled_complex_hermitian_mirror(pallas_interpret):
    import jax.numpy as jnp

    from htool_tpu.hmatrix.linalg import matvec_user, prepare_tiled_matvec
    from htool_tpu.testing import laplace_kernel_hermitian

    n = 1200
    pts = create_sphere(n)
    gen = ht.KernelGenerator(laplace_kernel_hermitian, pts, pts, dtype=jnp.complex64)
    tree = ht.build_cluster_tree(pts, max_leaf_size=64)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-5, eta=10.0, symmetry="H", UPLO="L")
    prepare_tiled_matvec(H)
    A = H.to_dense()
    rng = np.random.RandomState(3)
    x = (rng.randn(n, 2) + 1j * rng.randn(n, 2)).astype(np.complex64)
    got = np.asarray(matvec_user(H, x))
    err = np.linalg.norm(got - A @ x) / np.linalg.norm(A @ x)
    assert err < 1e-4, err


def test_split_plan_stage_b_chunking(pallas_interpret):
    """Wide stage-B factor blocks are chunked along the output width so the
    out-tile extension fits VMEM (the 6272-wide coarse-block path)."""
    import jax.numpy as jnp

    from htool_tpu.hmatrix.hmatrix import LowRankBucket
    from htool_tpu.ops.tiled_matvec import (
        _chunk_stand_width,
        build_tile_plan,
        tiled_bucket_matvec,
    )

    rng = np.random.RandomState(3)
    nb, b, r = 3, 96, 8
    n = 400
    t_off = np.array([0, 120, 280], np.int64)
    s_off = np.array([96, 0, 160], np.int64)
    U = rng.randn(nb, b, r).astype(np.float32)
    V = rng.randn(nb, r, b).astype(np.float32)
    x = rng.randn(n + 120, 3).astype(np.float32)
    # stage A (V contraction) + CHUNKED stage B (chunk < b forces the path)
    r_pad = 8
    mid_off = np.arange(nb, dtype=np.int64) * r_pad
    stageA_data = jnp.asarray(V)
    planA = build_tile_plan(
        type("S", (), {"data": stageA_data, "t_off": mid_off, "s_off": s_off,
                       "block_shape": (r, b)})(), "t", nb * r_pad + 16)
    stageB = _chunk_stand_width(
        jnp.swapaxes(jnp.asarray(U), 1, 2), mid_off, t_off, chunk=32
    )
    assert stageB.data.shape[0] == nb * 3  # 96 / 32 chunks
    planB = build_tile_plan(stageB, "s", n + 120)
    t = tiled_bucket_matvec(planA, jnp.asarray(x), jnp.float32)
    y = tiled_bucket_matvec(planB, t, jnp.float32)
    ref = np.zeros((n + 120, 3))
    for i in range(nb):
        ref[t_off[i] : t_off[i] + b] += (U[i] @ V[i]) @ x[s_off[i] : s_off[i] + b]
    err = np.linalg.norm(np.asarray(y)[: n] - ref[: n]) / np.linalg.norm(ref[: n])
    assert err < 1e-5, err
