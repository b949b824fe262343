"""Assembled-H-matrix post-processing: recompression and BLR conversion.

Two capabilities of the reference that act on an ALREADY-BUILT H-matrix:

- ``recompress_hmatrix``: apply SVD recompression over all low-rank leaves
  (reference ``hmatrix/utils/recompression.hpp:7-33`` — sequential/OpenMP
  loop over LR leaves; here one batched QR+SVD kernel per bucket).
- ``to_blr``: re-tile the adaptive flat H-matrix onto the uniform BLR grid
  so the factorization / compressed-product engine (``blr_lu``,
  ``blr_cholesky``, ``blr_matmul``) can consume the operator that was
  assembled — the TPU-native counterpart of the reference calling
  ``lu_factorization(hmatrix)`` / ``internal_add_hmatrix_hmatrix_product``
  directly on the built tree (``hmatrix/linalg/factorization.hpp:19-79``,
  ``add_hmatrix_hmatrix_product.hpp:24-312``).  No generator re-evaluation:
  every BLR cell is produced from the stored dense / U·V leaf data
  (low-rank leaves restrict to row/col slices rank-free; sub-cell leaves
  densify their cell).

User-facing factorization wrappers (``lu_factorization``, ``lu_solve``,
``cholesky_factorization``, ``cholesky_solve``, ``hmatrix_hmatrix_product``)
mirror the reference's free-function surface
(``factorization.hpp:82,119,205,245,256,273``).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..clustering.cluster_tree import ClusterTree
from .blr import DENSE, LR, ZERO, BLRMatrix, _grid_cells, blr_cholesky, blr_lu, blr_matmul, blr_solve
from .compressors import batched_recompress
from .hmatrix import HMatrix, LowRankBucket

__all__ = [
    "recompress_hmatrix",
    "to_blr",
    "lu_factorization",
    "lu_solve",
    "cholesky_factorization",
    "cholesky_solve",
    "hmatrix_hmatrix_product",
]


# ======================================================================
# recompression over all LR leaves (recompression.hpp:7-33)
# ======================================================================


def recompress_hmatrix(h: HMatrix, epsilon: float) -> HMatrix:
    """SVD-recompress every low-rank leaf of an assembled H-matrix.

    One batched QR+SVD kernel per LR bucket (the reference loops leaves:
    ``hmatrix/utils/recompression.hpp:7-33``).  Rank padding shrinks to the
    power-of-two cover of the new max rank, so subsequent products move
    less data.  Returns a new ``HMatrix``; the input is unchanged.
    """
    new_lr = []
    for b in h.lr_buckets:
        ranks_dev = jnp.asarray(np.asarray(b.ranks), jnp.int32)
        U2, V2, nr = batched_recompress(b.U, b.V, ranks_dev, epsilon)
        nr_host = np.asarray(nr)
        rmax = int(nr_host.max()) if nr_host.size else 0
        pad = 8
        while pad < rmax:
            pad *= 2
        pad = min(pad, int(U2.shape[2]))
        new_lr.append(
            replace(
                b,
                U=U2[:, :, :pad],
                V=V2[:, :pad, :],
                ranks=nr_host,
            )
        )
    return replace(h, lr_buckets=new_lr)


# ======================================================================
# adaptive H  ->  uniform-grid BLR
# ======================================================================


def _cell_span(offs: np.ndarray, ends: np.ndarray, off: int, size: int):
    """Indices of grid cells intersecting [off, off+size)."""
    i0 = int(np.searchsorted(offs, off, side="right")) - 1
    i1 = int(np.searchsorted(offs, off + size - 1, side="right")) - 1
    return i0, i1


def to_blr(
    h: HMatrix,
    tree: ClusterTree,
    block_size: int = 256,
    R_half: Optional[int] = None,
    epsilon: Optional[float] = None,
) -> BLRMatrix:
    """Re-tile an assembled (square, non-partition-restricted) H-matrix onto
    the uniform BLR grid of ``tree`` without re-evaluating the generator.

    Per grid cell: if covered by a single low-rank leaf (or several whose
    ranks fit the LR buffer), restrict the stored U/V factors to the cell's
    row/col slices and recompress; otherwise densify the cell from the
    stored leaf data.  Symmetric/hermitian storage is expanded (mirror
    leaves contribute their transpose/conj-transpose on the upper triangle),
    since factorization needs full storage.
    """
    if h.shape[0] != h.shape[1] or h.t_root_off != 0 or h.s_root_off != 0:
        raise ValueError("to_blr needs a square, non-restricted H-matrix")
    if h.shape[0] != tree.n_points or not np.array_equal(
        np.asarray(h.perm_t), tree.permutation
    ):
        raise ValueError(
            "tree does not match the H-matrix: to_blr must be given the "
            "cluster tree the matrix was assembled over "
            f"(h.shape[0]={h.shape[0]}, tree.n_points={tree.n_points})"
        )
    if epsilon is None:
        epsilon = 1e-6

    cells, offs, szs, level = _grid_cells(tree, block_size)
    nL = len(cells)
    ends = offs + szs
    b = max(8, int(-(-int(szs.max()) // 8) * 8))
    dtype = np.asarray(jnp.zeros((), h.dtype)).dtype

    herm = h.symmetry == "H"

    # ---- collect contributions per cell pair ------------------------------
    # contrib: (kind, payload); kind 'D' -> dense ndarray slice placed at
    # (r0, c0) local offsets; kind 'LR' -> (Ur, Vc) restricted factors.
    contribs: dict = {}

    def add(ci, cj, item):
        contribs.setdefault((ci, cj), []).append(item)

    def scatter_block(t_off, t_size, s_off, s_size, get_dense, get_lr, is_lr):
        ti0, ti1 = _cell_span(offs, ends, t_off, t_size)
        tj0, tj1 = _cell_span(offs, ends, s_off, s_size)
        for ci in range(ti0, ti1 + 1):
            r_lo = max(t_off, int(offs[ci]))
            r_hi = min(t_off + t_size, int(ends[ci]))
            for cj in range(tj0, tj1 + 1):
                c_lo = max(s_off, int(offs[cj]))
                c_hi = min(s_off + s_size, int(ends[cj]))
                # slice within the leaf / placement within the cell
                sl_r = slice(r_lo - t_off, r_hi - t_off)
                sl_c = slice(c_lo - s_off, c_hi - s_off)
                at = (r_lo - int(offs[ci]), c_lo - int(offs[cj]))
                if is_lr:
                    add(ci, cj, ("LR", get_lr(sl_r, sl_c), at))
                else:
                    add(ci, cj, ("D", get_dense(sl_r, sl_c), at))

    for bk in h.dense_buckets:
        data = np.asarray(bk.data)
        t_off = np.asarray(bk.t_off)
        s_off = np.asarray(bk.s_off)
        for q in range(bk.n_blocks):
            ts, ss = int(bk.t_sizes[q]), int(bk.s_sizes[q])
            blk = data[q, :ts, :ss]
            scatter_block(
                int(t_off[q]), ts, int(s_off[q]), ss,
                lambda r, c, blk=blk: blk[r, c], None, False,
            )
            if bk.mirror:
                mb = np.conj(blk.T) if herm else blk.T
                scatter_block(
                    int(s_off[q]), ss, int(t_off[q]), ts,
                    lambda r, c, mb=mb: mb[r, c], None, False,
                )

    for bk in h.lr_buckets:
        U = np.asarray(bk.U)
        V = np.asarray(bk.V)
        t_off = np.asarray(bk.t_off)
        s_off = np.asarray(bk.s_off)
        rks = np.asarray(bk.ranks)
        for q in range(bk.n_blocks):
            ts, ss, r = int(bk.t_sizes[q]), int(bk.s_sizes[q]), int(rks[q])
            Uq = U[q, :ts, :r]
            Vq = V[q, :r, :ss]
            scatter_block(
                int(t_off[q]), ts, int(s_off[q]), ss,
                None, lambda rr, cc, Uq=Uq, Vq=Vq: (Uq[rr], Vq[:, cc]), True,
            )
            if bk.mirror:
                Um = np.conj(Vq.T) if herm else Vq.T
                Vm = np.conj(Uq.T) if herm else Uq.T
                scatter_block(
                    int(s_off[q]), ss, int(t_off[q]), ts,
                    None, lambda rr, cc, Um=Um, Vm=Vm: (Um[rr], Vm[:, cc]), True,
                )

    # ---- decide R_half -----------------------------------------------------
    def lr_total_rank(items):
        return sum(p[0].shape[1] for k, p, _ in items if k == "LR")

    if R_half is None:
        cand = [
            lr_total_rank(items)
            for items in contribs.values()
            if all(k == "LR" for k, _, _ in items)
        ]
        rmax = max(cand, default=16)
        R_half = 8
        while R_half < rmax:
            R_half *= 2
        R_half = max(16, min(R_half, b // 2))
    # same alignment invariant as build_blr: multiple of 8, at most b//2
    R_half = max(8, min(int(R_half), b // 2))
    R_half = int(-(-R_half // 8) * 8)
    R_buf = 2 * R_half

    # ---- build cells -------------------------------------------------------
    cls = np.zeros((nL, nL), np.int8)
    dense_slot = np.full((nL, nL), -1, np.int32)
    lr_slot = np.full((nL, nL), -1, np.int32)
    D_list, U_list, V_list, rank_list = [], [], [], []

    for (ci, cj), items in sorted(contribs.items()):
        all_lr = all(k == "LR" for k, _, _ in items)
        if all_lr and lr_total_rank(items) <= R_half:
            Uc = np.zeros((b, R_buf), dtype)
            Vc = np.zeros((R_buf, b), dtype)
            pos = 0
            for _, (Ur, Vr), (r0, c0) in items:
                r = Ur.shape[1]
                Uc[r0 : r0 + Ur.shape[0], pos : pos + r] = Ur
                Vc[pos : pos + r, c0 : c0 + Vr.shape[1]] = Vr
                pos += r
            cls[ci, cj] = LR
            lr_slot[ci, cj] = len(U_list)
            U_list.append(Uc)
            V_list.append(Vc)
            rank_list.append(pos)
        else:
            Dc = np.zeros((b, b), dtype)
            for k, p, (r0, c0) in items:
                if k == "D":
                    blk = p
                else:
                    Ur, Vr = p
                    blk = Ur @ Vr
                Dc[r0 : r0 + blk.shape[0], c0 : c0 + blk.shape[1]] += blk
            if ci == cj and int(szs[ci]) < b:
                idx = np.arange(int(szs[ci]), b)
                Dc[idx, idx] = 1.0  # keep padded diagonal invertible
            cls[ci, cj] = DENSE
            dense_slot[ci, cj] = len(D_list)
            D_list.append(Dc)

    nd, nl = len(D_list), len(U_list)
    D = jnp.asarray(
        np.concatenate([np.stack(D_list) if nd else np.zeros((0, b, b), dtype), np.zeros((1, b, b), dtype)])
    )
    U = jnp.asarray(
        np.concatenate([np.stack(U_list) if nl else np.zeros((0, b, R_buf), dtype), np.zeros((1, b, R_buf), dtype)])
    )
    V = jnp.asarray(
        np.concatenate([np.stack(V_list) if nl else np.zeros((0, R_buf, b), dtype), np.zeros((1, R_buf, b), dtype)])
    )
    ranks = jnp.asarray(np.array(rank_list + [0], np.int32))

    # tighten: one batched recompression over all LR cells
    if nl:
        U2, V2, nr = batched_recompress(U[:-1], V[:-1], ranks[:-1], epsilon)
        U = jnp.concatenate([U2, U[-1:]])
        V = jnp.concatenate([V2, V[-1:]])
        ranks = jnp.concatenate([nr, ranks[-1:]])

    perm = tree.permutation
    return BLRMatrix(
        n=tree.n_points,
        cell_off=offs,
        cell_size=szs,
        b=b,
        cls=cls,
        dense_slot=dense_slot,
        lr_slot=lr_slot,
        D=D,
        U=U,
        V=V,
        ranks=ranks,
        R_half=R_half,
        epsilon=float(epsilon),
        permutation=perm,
        info=dict(level=level, n_cells=nL, from_hmatrix=True),
    )


# ======================================================================
# user-facing factorization surface (factorization.hpp:82-290)
# ======================================================================


def lu_factorization(
    h: HMatrix,
    tree: ClusterTree,
    epsilon: Optional[float] = None,
    block_size: int = 256,
) -> BLRMatrix:
    """Compressed LU of an assembled H-matrix
    (reference ``lu_factorization``, ``hmatrix/linalg/factorization.hpp:82``)."""
    return blr_lu(to_blr(h, tree, block_size=block_size, epsilon=epsilon), epsilon)


def cholesky_factorization(
    h: HMatrix,
    tree: ClusterTree,
    epsilon: Optional[float] = None,
    block_size: int = 256,
) -> BLRMatrix:
    """Compressed Cholesky of an assembled H-matrix
    (reference ``cholesky_factorization``, ``factorization.hpp:205``)."""
    return blr_cholesky(to_blr(h, tree, block_size=block_size, epsilon=epsilon), epsilon)


def lu_solve(F: BLRMatrix, rhs, user_numbering: bool = True, trans: str = "N"):
    """Solve op(A) x = rhs with a compressed LU (reference ``lu_solve``,
    ``factorization.hpp:256``), trans ∈ {'N','T','C'}."""
    if not (F.factorized and F.kind == "lu"):
        raise ValueError("lu_solve needs an LU-factorized BLRMatrix")
    if trans not in ("N", "T", "C"):
        raise ValueError("trans must be 'N', 'T' or 'C'")
    return blr_solve(F, rhs, user_numbering=user_numbering, trans=trans)


def cholesky_solve(F: BLRMatrix, rhs, user_numbering: bool = True,
                   UPLO: str = "L"):
    """Solve with a compressed Cholesky (reference ``cholesky_solve``,
    ``factorization.hpp:273``).  Storage is canonical lower (A = L·L^H); the
    UPLO argument mirrors the reference surface — for a hermitian matrix the
    'U' factorization solves the same system, so both values are accepted."""
    if not (F.factorized and F.kind == "chol"):
        raise ValueError("cholesky_solve needs a Cholesky-factorized BLRMatrix")
    if UPLO not in ("L", "U"):
        raise ValueError("UPLO must be 'L' or 'U'")
    return blr_solve(F, rhs, user_numbering=user_numbering)


def hmatrix_hmatrix_product(
    A: HMatrix,
    B: HMatrix,
    tree: ClusterTree,
    epsilon: Optional[float] = None,
    block_size: int = 256,
) -> BLRMatrix:
    """Compressed product of two assembled H-matrices over the same cluster
    tree (reference ``internal_add_hmatrix_hmatrix_product`` → HMatrix,
    ``hmatrix/linalg/add_hmatrix_hmatrix_product.hpp:210``)."""
    Fa = to_blr(A, tree, block_size=block_size, epsilon=epsilon)
    Fb = to_blr(B, tree, block_size=block_size, epsilon=epsilon)
    return blr_matmul(Fa, Fb, epsilon)
