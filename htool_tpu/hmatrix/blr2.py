"""Two-level BLR factorization prototype — toward H-LU memory asymptotics.

One-level BLR stores every off-diagonal far-field interaction as per-cell
low-rank factors: O((N/b)²·b·r) memory, the wrong asymptotics at the 1M
BASELINE target.  This prototype adds ONE level of hierarchy (the direction
of the reference's fully recursive H-LU, ``factorization.hpp:19-79``):

- the matrix is tiled into nC coarse PANELS (cluster-tree nodes);
- diagonal panels are one-level BLR matrices (factorized with
  :func:`..hmatrix.blr.blr_lu`);
- EVERY off-diagonal panel is a single panel-level low-rank factor
  (U_IJ [m_I, R] · V_IJ [R, m_J]) from the batched ACA — memory
  O(nC²·Bc·R) = O(N·nC·R), a factor ~Bc/b below one-level for the
  far field;
- the right-looking panel LU reuses the one-level machinery: diagonal
  panel factorization, panel triangular solves on the LR factors
  (:func:`..hmatrix.blr.blr_triangular_solve`), low-rank Schur products
  with recompression, and cell-wise low-rank updates onto the BLR diagonal
  panels.

Applicability: geometries where off-diagonal PANELS are numerically
low-rank at the chosen coarse size (single-layer-potential-type kernels;
the panel ACA escalates its rank cap and raises if a panel fails).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..clustering.cluster_tree import ClusterTree, ClusterTreeBuilder
from ..generator import Generator, SubsetGenerator
from .aca import batched_partial_aca
from .blr import (
    BLRMatrix,
    _grid_cells,
    blr_lu,
    blr_matvec,
    blr_solve,
    blr_triangular_solve,
    build_blr,
    widen_blr,
)
from .compressors import batched_recompress, svd_truncation_rank

__all__ = ["TwoLevelBLR", "build_blr2", "blr2_lu", "blr2_solve", "blr2_matvec"]


@dataclass
class TwoLevelBLR:
    """Coarse-panel two-level compressed matrix (cluster numbering)."""

    n: int
    panel_off: np.ndarray  # [nC] offsets into cluster numbering
    panel_size: np.ndarray  # [nC]
    diag: list  # [nC] BLRMatrix (panel-local cluster ordering)
    panel_perm: list  # [nC] panel-local cluster ordering -> panel rows
    pU: dict = field(default_factory=dict)  # (I,J) -> [m_I, R]
    pV: dict = field(default_factory=dict)  # (I,J) -> [R, m_J]
    epsilon: float = 1e-6
    permutation: np.ndarray = None  # cluster -> user (global tree)
    factorized: bool = False
    info: dict = field(default_factory=dict)

    @property
    def nC(self) -> int:
        return int(self.panel_off.shape[0])

    def memory_bytes(self) -> int:
        total = 0
        for B in self.diag:
            total += B.D.size * B.D.dtype.itemsize
            total += B.U.size * B.U.dtype.itemsize
            total += B.V.size * B.V.dtype.itemsize
        for U in self.pU.values():
            total += U.size * U.dtype.itemsize
        for V in self.pV.values():
            total += V.size * V.dtype.itemsize
        return int(total)

    def to_dense(self) -> np.ndarray:
        A = np.zeros((self.n, self.n), np.asarray(self.diag[0].D).dtype)
        for I in range(self.nC):
            oI, sI = int(self.panel_off[I]), int(self.panel_size[I])
            pI = self.panel_perm[I]
            DI = self.diag[I].to_dense()  # panel-local cluster ordering
            blk = np.zeros_like(DI)
            blk[np.ix_(pI, pI)] = DI
            A[oI : oI + sI, oI : oI + sI] = blk
            for J in range(self.nC):
                if I == J or (I, J) not in self.pU:
                    continue
                oJ, sJ = int(self.panel_off[J]), int(self.panel_size[J])
                blk = np.asarray(self.pU[(I, J)]) @ np.asarray(self.pV[(I, J)])
                out = np.zeros((sI, sJ), blk.dtype)
                out[np.ix_(pI, self.panel_perm[J])] = blk
                A[oI : oI + sI, oJ : oJ + sJ] = out
        return A


def _panel_aca(generator, rows_I, rows_J, epsilon, caps):
    """Single-block escalating ACA on a panel pair in the PANEL-LOCAL
    cluster orderings; raises if even the last cap fails."""
    mi, mj = rows_I.size, rows_J.size
    for cap in caps:
        U, V, rank, failed = batched_partial_aca(
            generator,
            jnp.asarray(rows_I[None, :], jnp.int32),
            jnp.asarray(rows_J[None, :], jnp.int32),
            jnp.asarray([mi], jnp.int32),
            jnp.asarray([mj], jnp.int32),
            epsilon,
            int(cap),
        )
        if not bool(np.asarray(failed)[0]):
            r = int(np.asarray(rank)[0])
            return U[0][:, :r], V[0][:r, :]
    raise ValueError(
        f"panel of size ({mi}, {mj}) is not low-rank at rank cap {caps[-1]}; "
        "use a smaller coarse_size or raise panel_rank_cap"
    )


def build_blr2(
    generator: Generator,
    tree: ClusterTree,
    epsilon: float = 1e-6,
    coarse_size: int = 4096,
    block_size: int = 256,
    panel_rank_cap: int = 512,
    eta: float = 10.0,
) -> TwoLevelBLR:
    """Assemble the two-level matrix: BLR diagonal panels + panel-level LR
    off-diagonal factors."""
    cells, offs, szs, level = _grid_cells(tree, coarse_size)
    nC = len(cells)
    perm = tree.permutation
    t0 = time.perf_counter()

    diag, panel_perm, rows_perm = [], [], []
    for I in range(nC):
        off, sz = int(offs[I]), int(szs[I])
        sub_user = perm[off : off + sz]
        sub_tree = ClusterTreeBuilder(
            max_leaf_size=min(block_size, max(32, sz // 8))
        ).build(tree.points[sub_user])
        sub_gen = SubsetGenerator(generator, sub_user)
        diag.append(build_blr(sub_gen, sub_tree, epsilon=epsilon, eta=eta,
                              block_size=block_size))
        panel_perm.append(sub_tree.permutation)
        rows_perm.append(sub_user[sub_tree.permutation])

    caps = [c for c in (64, 128, 256) if c < panel_rank_cap] + [panel_rank_cap]
    pU, pV = {}, {}
    for I in range(nC):
        for J in range(nC):
            if I == J:
                continue
            pU[(I, J)], pV[(I, J)] = _panel_aca(
                generator, rows_perm[I], rows_perm[J], epsilon, caps
            )

    return TwoLevelBLR(
        n=tree.n_points,
        panel_off=offs,
        panel_size=szs,
        diag=diag,
        panel_perm=panel_perm,
        pU=pU,
        pV=pV,
        epsilon=float(epsilon),
        permutation=perm,
        info=dict(
            n_panels=nC,
            coarse_level=level,
            build_walltime=time.perf_counter() - t0,
        ),
    )


def _blr_add_lowrank(B: BLRMatrix, Uc, Vc, epsilon):
    """B += Uc·Vc cell-wise (panel-local cluster ordering): dense cells add
    directly; low-rank cells re-compress (dense materialize + batched SVD —
    rank-safe for contributions beyond the R_half cap; the panel is widened
    when the epsilon-rank exceeds it)."""
    from .blr import DENSE, LR, _cells_plan

    nL, b, Rh = B.nL, B.b, B.R_half
    pad_idx, mask, _ = _cells_plan(B)
    Up = jnp.concatenate([Uc, jnp.zeros((1, Uc.shape[1]), Uc.dtype)], axis=0)
    Vp = jnp.concatenate([Vc, jnp.zeros((Vc.shape[0], 1), Vc.dtype)], axis=1)
    Ur = jnp.where(mask[:, :, None], Up[pad_idx], 0)  # [nL, b, R]
    Vcl = jnp.where(mask[:, None, :], Vp[:, pad_idx].transpose(1, 0, 2), 0)

    di, dj = np.nonzero(B.cls == DENSE)
    if di.size:
        slots = jnp.asarray(B.dense_slot[di, dj])
        contrib = jnp.einsum("cbr,crk->cbk", Ur[di], Vcl[dj])
        B.D = B.D.at[slots].add(contrib.astype(B.dtype))
    li, lj = np.nonzero(B.cls == LR)
    if li.size:
        slots = jnp.asarray(B.lr_slot[li, lj])
        old = jnp.einsum(
            "cbr,crk->cbk", B.U[slots][:, :, :Rh], B.V[slots][:, :Rh, :]
        )
        new = old + jnp.einsum("cbr,crk->cbk", Ur[li], Vcl[lj]).astype(B.dtype)
        Uf, s, Vh = jnp.linalg.svd(new, full_matrices=False)
        r = svd_truncation_rank(s, epsilon)
        r_needed = int(np.asarray(r).max()) if r.size else 0
        if r_needed > Rh:
            # escalate the panel's rank cap and retry on wider buffers
            B2 = widen_blr(B, max(2 * Rh, -(-r_needed // 8) * 8))
            B.U, B.V, B.R_half = B2.U, B2.V, B2.R_half
            B.cache.clear()
            return _blr_add_lowrank(B, Uc, Vc, epsilon)
        w = B.U.shape[2]
        keep = jnp.arange(w)[None, :] < jnp.minimum(r, Rh)[:, None]
        Unew = (Uf[:, :, :w] * s[:, None, :w].astype(B.dtype)) * keep[:, None, :]
        Vnew = Vh[:, :w, :] * keep[:, :, None]
        B.U = B.U.at[slots].set(Unew.astype(B.dtype))
        B.V = B.V.at[slots].set(Vnew.astype(B.dtype))
        B.ranks = B.ranks.at[slots].set(
            jnp.minimum(r, Rh).astype(jnp.int32)
        )
    return B


def _lr_truncate(U, V, epsilon):
    """Truncated recompression of one low-rank pair."""
    r = U.shape[1]
    if r == 0:
        return U, V
    U2, V2, nr = batched_recompress(U[None], V[None], jnp.asarray([r], jnp.int32),
                                    epsilon)
    k = int(np.asarray(nr)[0])
    return U2[0][:, :k], V2[0][:k, :]


def blr2_lu(A: TwoLevelBLR, epsilon: Optional[float] = None) -> TwoLevelBLR:
    """Right-looking panel LU: factor the diagonal panel, transform the
    panel row/column low-rank factors through its triangular solves, and
    apply low-rank Schur updates (recompressed) to the trailing panels —
    the reference's recursive H-LU one level up (factorization.hpp:19-79)."""
    if A.factorized:
        raise ValueError("already factorized")
    eps = A.epsilon if epsilon is None else epsilon
    nC = A.nC
    t0 = time.perf_counter()
    diag = list(A.diag)
    pU = dict(A.pU)
    pV = dict(A.pV)

    for K in range(nC):
        diag[K] = blr_lu(diag[K], eps, error_estimate=False)
        FK = diag[K]
        # column panel: L_IK = A_IK Û_K^{-1}  (transform V factors)
        for I in range(K + 1, nC):
            pV[(I, K)] = blr_triangular_solve(
                FK, pV[(I, K)], which="U", side="R"
            )
        # row panel: Û_KJ = L̂_K^{-1} A_KJ  (transform U factors)
        for J in range(K + 1, nC):
            pU[(K, J)] = blr_triangular_solve(
                FK, pU[(K, J)], which="L", side="L"
            )
        # Schur updates on the trailing block
        for I in range(K + 1, nC):
            UI = pU[(I, K)]
            VIK = pV[(I, K)]
            for J in range(K + 1, nC):
                mid = VIK @ pU[(K, J)]  # [rIK, rKJ]
                Uc = -(UI @ mid)  # [m_I, rKJ]
                Vc = pV[(K, J)]
                if I == J:
                    _blr_add_lowrank(diag[I], Uc, Vc, eps)
                else:
                    Un = jnp.concatenate([pU[(I, J)], Uc], axis=1)
                    Vn = jnp.concatenate([pV[(I, J)], Vc], axis=0)
                    pU[(I, J)], pV[(I, J)] = _lr_truncate(Un, Vn, eps)

    out = TwoLevelBLR(
        n=A.n,
        panel_off=A.panel_off,
        panel_size=A.panel_size,
        diag=diag,
        panel_perm=A.panel_perm,
        pU=pU,
        pV=pV,
        epsilon=eps,
        permutation=A.permutation,
        factorized=True,
        info=dict(A.info),
    )
    out.info["lu_walltime"] = time.perf_counter() - t0
    return out


def _panel_slices(F: TwoLevelBLR, x):
    out = []
    for I in range(F.nC):
        o, s = int(F.panel_off[I]), int(F.panel_size[I])
        out.append(x[o : o + s][jnp.asarray(F.panel_perm[I])])
    return out


def _panel_unslice(F: TwoLevelBLR, parts, k):
    x = jnp.zeros((F.n, k), parts[0].dtype)
    for I in range(F.nC):
        o, s = int(F.panel_off[I]), int(F.panel_size[I])
        inv = np.argsort(F.panel_perm[I])
        x = x.at[o : o + s].set(parts[I][jnp.asarray(inv)])
    return x


def blr2_solve(F: TwoLevelBLR, rhs, user_numbering: bool = False):
    """Solve with the panel factorization: forward sweep on the unit-panel
    lower factor (diagonal applies L̂_K^{-1}), backward on the upper."""
    if not F.factorized:
        raise ValueError("call blr2_lu first")
    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    if user_numbering:
        rhs = rhs[jnp.asarray(F.permutation)]
    k = rhs.shape[1]
    b = _panel_slices(F, rhs)
    nC = F.nC

    # forward: y_K = L̂_K^{-1} (b_K - sum_{J<K} L_KJ y_J)
    y = [None] * nC
    for K in range(nC):
        acc = b[K]
        for J in range(K):
            acc = acc - F.pU[(K, J)] @ (F.pV[(K, J)] @ y[J])
        y[K] = blr_triangular_solve(F.diag[K], acc, which="L")
    # backward: x_K = Û_K^{-1} (y_K - sum_{J>K} Û_KJ x_J)
    x = [None] * nC
    for K in range(nC - 1, -1, -1):
        acc = y[K]
        for J in range(K + 1, nC):
            acc = acc - F.pU[(K, J)] @ (F.pV[(K, J)] @ x[J])
        x[K] = blr_triangular_solve(F.diag[K], acc, which="U")

    out = _panel_unslice(F, x, k)
    if user_numbering:
        out = jnp.zeros_like(out).at[jnp.asarray(F.permutation)].set(out)
    return out[:, 0] if squeeze else out


def blr2_matvec(A: TwoLevelBLR, x):
    """y = A x in cluster numbering."""
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    parts = _panel_slices(A, x)
    out = []
    for I in range(A.nC):
        acc = blr_matvec(A.diag[I], parts[I])
        for J in range(A.nC):
            if J != I:
                acc = acc + (A.pU[(I, J)] @ (A.pV[(I, J)] @ parts[J])).astype(acc.dtype)
        out.append(acc)
    y = _panel_unslice(A, out, x.shape[1])
    return y[:, 0] if squeeze else y
