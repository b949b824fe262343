"""Block low-rank (BLR) arithmetic: compressed LU factorization, triangular
solves, and compressed×compressed products on a uniform cluster-tree level.

TPU-native re-design of the reference's recursive H-arithmetic
(``hmatrix/linalg/factorization.hpp:19-205`` H-LU/H-Cholesky,
``triangular_hmatrix_hmatrix_solve.hpp:19-198``,
``add_hmatrix_hmatrix_product.hpp:24-312`` H×H): the pointer-tree recursion
with per-node dynamic ranks is hostile to XLA, so the factorization runs on
the **uniform grid of cluster nodes at one tree level** (the BLR format of
Amestoy et al., used by MUMPS): every block is a b×b cell, classified
dense / low-rank / zero by the same Rjasanow–Steinbach admissibility, and
the right-looking block LU

    for k:  LU(A_kk);  L_ik = A_ik A_kk⁻¹;  A_ij -= L_ik A_kj

executes as batched device kernels over all cells of a class at once.  The
fill-in pattern and class upgrades are data-independent, so a host-side
symbolic pass precomputes the whole schedule (the analog of the reference's
L0/task-dependency planning, ``task_dependencies.hpp``), and the device
only ever sees static shapes: dense cells ``[nd, b, b]``, low-rank cells
``U [nl, b, 2R] / V [nl, 2R, b]`` with on-device ranks, truncated back to
rank ≤ R by batched QR+SVD recompression after every step (the LR+LR
truncated addition of ``add_lrmat_lrmat.hpp:14-108``).

Storage invariant: stored LR ranks ≤ R_half; one Schur contribution per
step has rank ≤ R_half; buffers are 2·R_half wide, so appends never
overflow before the end-of-step recompression.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..clustering.cluster_tree import ClusterTree
from ..generator import Generator
from .aca import batched_partial_aca
from .block_tree import plan_block_tree
from .compressors import batched_recompress, svd_truncation_rank

__all__ = [
    "BLRMatrix",
    "build_blr",
    "blr_lu",
    "blr_cholesky",
    "blr_solve",
    "blr_matvec",
    "blr_matmul",
]

ZERO, DENSE, LR = 0, 1, 2


# ======================================================================
# container
# ======================================================================


@dataclass
class BLRMatrix:
    """Uniform-grid block low-rank matrix (cluster numbering)."""

    n: int  # true matrix size
    cell_off: np.ndarray  # [nL]
    cell_size: np.ndarray  # [nL]
    b: int  # padded cell size
    cls: np.ndarray  # [nL, nL] int8
    dense_slot: np.ndarray  # [nL, nL] int32, -1 if none (last slot = dummy)
    lr_slot: np.ndarray  # [nL, nL] int32
    D: Any  # [nd+1, b, b] (slot nd = scratch dummy)
    U: Any  # [nl+1, b, Rbuf]
    V: Any  # [nl+1, Rbuf, b]
    ranks: Any  # [nl+1] int32 device
    piv: Any = None  # [nL, b] int32 diag pivots (after factorization)
    R_half: int = 16
    epsilon: float = 1e-6
    factorized: bool = False
    kind: str = "lu"  # factorization kind once factorized: "lu" | "chol"
    permutation: np.ndarray = None  # cluster -> user
    info: dict = field(default_factory=dict)

    @property
    def nL(self) -> int:
        return int(self.cell_off.shape[0])

    @property
    def dtype(self):
        return self.D.dtype

    @property
    def R_buf(self) -> int:
        return int(self.U.shape[2])

    # ------------------------------------------------------------------
    def to_dense(self, user_numbering: bool = False) -> np.ndarray:
        nL, b = self.nL, self.b
        D = np.asarray(self.D)
        U = np.asarray(self.U)
        V = np.asarray(self.V)
        rk = np.asarray(self.ranks)
        A = np.zeros((nL * b, nL * b), D.dtype)
        for i in range(nL):
            for j in range(nL):
                c = self.cls[i, j]
                if c == ZERO:
                    continue
                if c == DENSE:
                    blk = D[self.dense_slot[i, j]]
                else:
                    s = self.lr_slot[i, j]
                    r = int(rk[s])
                    blk = U[s][:, :r] @ V[s][:r, :]
                A[i * b : (i + 1) * b, j * b : (j + 1) * b] = blk
        # compact padded rows/cols
        keep = np.concatenate(
            [i * b + np.arange(sz) for i, sz in enumerate(self.cell_size)]
        )
        A = A[np.ix_(keep, keep)]
        if user_numbering:
            out = np.zeros_like(A)
            out[np.ix_(self.permutation, self.permutation)] = A
            return out
        return A

    def compression_info(self) -> dict:
        rk = np.asarray(self.ranks)
        nd = int((self.cls == DENSE).sum())
        nl = int((self.cls == LR).sum())
        stored = nd * self.b * self.b
        for i, j in zip(*np.nonzero(self.cls == LR)):
            stored += 2 * self.b * int(rk[self.lr_slot[i, j]])
        total = float(self.n) * self.n
        return dict(
            n_dense_cells=nd,
            n_lr_cells=nl,
            n_zero_cells=int((self.cls == ZERO).sum()),
            compression_ratio=total / stored if stored else float("inf"),
            rank_max=int(rk[:-1].max()) if rk.size > 1 else 0,
        )


# ======================================================================
# assembly
# ======================================================================


def _grid_cells(tree: ClusterTree, b_target: int):
    """Pick the deepest level whose cells are all <= b_target, returning
    (node_ids, offsets, sizes) tiling [0, N)."""
    level = 0
    while True:
        cells = []
        ok = True
        stack = [0]
        while stack:
            nd = stack.pop()
            if tree.depths[nd] == level or tree.is_leaf(nd):
                cells.append(nd)
                if tree.sizes[nd] > b_target:
                    ok = False
            else:
                stack.extend(reversed(tree.node_children(nd).tolist()))
        if ok or all(
            tree.is_leaf(c) for c in cells
        ):  # cannot split further
            break
        level += 1
    cells = sorted(cells, key=lambda nd: tree.offsets[nd])
    offs = np.array([tree.offsets[c] for c in cells], np.int64)
    szs = np.array([tree.sizes[c] for c in cells], np.int64)
    return np.array(cells), offs, szs, level


def build_blr(
    generator: Generator,
    tree: ClusterTree,
    epsilon: float = 1e-6,
    eta: float = 10.0,
    block_size: int = 256,
    R_half: Optional[int] = None,
) -> BLRMatrix:
    """Assemble a BLR matrix: admissible cells via batched partial ACA,
    the rest dense — one ACA kernel and one dense-gather kernel total."""
    cells, offs, szs, level = _grid_cells(tree, block_size)
    nL = len(cells)
    b = max(8, int(-(-int(szs.max()) // 8) * 8))
    N = tree.n_points
    perm = tree.permutation
    dtype = generator.dtype

    if R_half is None:
        R_half = max(16, min(b // 2, 64))
    R_half = int(-(-R_half // 8) * 8)
    R_buf = 2 * R_half

    # classify cell pairs by admissibility (same rule as the block tree)
    from .block_tree import rjasanow_steinbach

    cls = np.zeros((nL, nL), np.int8)
    for i in range(nL):
        for j in range(nL):
            ti, sj = cells[i], cells[j]
            adm = rjasanow_steinbach(
                tree.centers[ti], tree.radii[ti], tree.centers[sj], tree.radii[sj], eta
            )
            cls[i, j] = LR if adm else DENSE

    ar = np.arange(b)[None, :]

    def gather_idx(sel):  # user-numbering indices per cell in sel
        rel = np.minimum(ar, szs[sel][:, None] - 1)
        return perm[offs[sel][:, None] + rel]

    # --- low-rank cells: one batched ACA ---
    lr_pairs = np.argwhere(cls == LR)
    lr_slot = np.full((nL, nL), -1, np.int32)
    U_list = V_list = None
    if lr_pairs.size:
        rows = jnp.asarray(gather_idx(lr_pairs[:, 0]), jnp.int32)
        colsx = jnp.asarray(gather_idx(lr_pairs[:, 1]), jnp.int32)
        Ua, Va, rank, failed = batched_partial_aca(
            generator,
            rows,
            colsx,
            jnp.asarray(szs[lr_pairs[:, 0]], jnp.int32),
            jnp.asarray(szs[lr_pairs[:, 1]], jnp.int32),
            epsilon,
            R_half,
        )
        rank = np.asarray(rank)
        failed = np.asarray(failed)
        ok = ~failed
        for t, (i, j) in enumerate(lr_pairs):
            if not ok[t]:
                cls[i, j] = DENSE
        sel = np.nonzero(ok)[0]
        nl = sel.size
        U = jnp.zeros((nl + 1, b, R_buf), dtype)
        V = jnp.zeros((nl + 1, R_buf, b), dtype)
        U = U.at[:nl, :, :R_half].set(Ua[sel])
        V = V.at[:nl, :R_half, :].set(Va[sel])
        ranks = jnp.concatenate(
            [jnp.asarray(rank[sel], jnp.int32), jnp.zeros((1,), jnp.int32)]
        )
        for t_new, t_old in enumerate(sel):
            i, j = lr_pairs[t_old]
            lr_slot[i, j] = t_new
    else:
        nl = 0
        U = jnp.zeros((1, b, R_buf), dtype)
        V = jnp.zeros((1, R_buf, b), dtype)
        ranks = jnp.zeros((1,), jnp.int32)

    # --- dense cells: one batched gather ---
    dn_pairs = np.argwhere(cls == DENSE)
    dense_slot = np.full((nL, nL), -1, np.int32)
    nd = dn_pairs.shape[0]
    if nd:
        rows = jnp.asarray(gather_idx(dn_pairs[:, 0]), jnp.int32)
        colsx = jnp.asarray(gather_idx(dn_pairs[:, 1]), jnp.int32)
        data = generator.block(rows, colsx)
        rmask = jnp.asarray(ar < szs[dn_pairs[:, 0]][:, None])
        cmask = jnp.asarray(ar < szs[dn_pairs[:, 1]][:, None])
        data = jnp.where(rmask[:, :, None] & cmask[:, None, :], data, 0)
        D = jnp.concatenate([data, jnp.zeros((1, b, b), dtype)], axis=0)
        for t, (i, j) in enumerate(dn_pairs):
            dense_slot[i, j] = t
    else:
        D = jnp.zeros((1, b, b), dtype)

    # identity on diagonal padding so diagonal cells stay invertible
    diag_cells = [dense_slot[i, i] for i in range(nL)]
    eye = jnp.eye(b, dtype=dtype)
    for i, s in enumerate(diag_cells):
        if s >= 0 and szs[i] < b:
            pad_eye = jnp.where(
                (jnp.arange(b) >= szs[i])[:, None] & (jnp.arange(b)[:, None] == jnp.arange(b)[None, :]),
                eye,
                0,
            )
            D = D.at[s].add(pad_eye)

    return BLRMatrix(
        n=N,
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
        epsilon=epsilon,
        permutation=perm,
        info=dict(level=level, n_cells=nL),
    )


# ======================================================================
# batched kernels (jitted; counts padded by caller)
# ======================================================================


@jax.jit
def _k_lu_diag(D, slot):
    lu, piv = jax.scipy.linalg.lu_factor(D[slot])
    return D.at[slot].set(lu), piv


@jax.jit
def _k_col_panel_dense(D, slots, lu_k, piv_k):
    """L_ik = A_ik A_kk^{-1} for dense cells: Xᵀ = solve(A_kkᵀ, A_ikᵀ)."""
    A = D[slots]  # [c, b, b]
    Xt = jax.vmap(lambda a: jax.scipy.linalg.lu_solve((lu_k, piv_k), a.T, trans=1))(A)
    return D.at[slots].set(jnp.swapaxes(Xt, 1, 2))


@jax.jit
def _k_col_panel_lr(V, slots, lu_k, piv_k):
    """L_ik = U (V A_kk^{-1}) for LR cells: transform V."""
    Vv = V[slots]  # [c, R, b]
    Xt = jax.vmap(lambda v: jax.scipy.linalg.lu_solve((lu_k, piv_k), v.T, trans=1))(Vv)
    return V.at[slots].set(jnp.swapaxes(Xt, 1, 2))


@jax.jit
def _k_chol_diag(D, slot):
    """L_kk = chol(A_kk) (lower). Hermitian/real-symmetric positive definite
    diagonal cells only (the potrf path, factorization.hpp:131-205)."""
    L = jnp.linalg.cholesky(D[slot])
    return D.at[slot].set(L)


@jax.jit
def _k_col_panel_dense_chol(D, slots, L_k):
    """L_ik = A_ik L_kk^{-H} for dense cells: X^H = L_kk^{-1} A_ik^H."""
    A = D[slots]  # [c, b, b]
    Xh = jax.vmap(
        lambda a: jax.scipy.linalg.solve_triangular(L_k, jnp.conj(a).T, lower=True)
    )(A)
    return D.at[slots].set(jnp.conj(jnp.swapaxes(Xh, 1, 2)))


@jax.jit
def _k_col_panel_lr_chol(V, slots, L_k):
    """L_ik = U (V L_kk^{-H}) for LR cells: transform V."""
    Vv = V[slots]  # [c, R, b]
    Xh = jax.vmap(
        lambda v: jax.scipy.linalg.solve_triangular(L_k, jnp.conj(v).T, lower=True)
    )(Vv)
    return V.at[slots].set(jnp.conj(jnp.swapaxes(Xh, 1, 2)))


@jax.jit
def _k_densify(D, dslots, U, V, lslots):
    """Materialize LR cells into dense slots (class upgrade)."""
    blk = jnp.einsum("cbr,crn->cbn", U[lslots], V[lslots])
    return D.at[dslots].set(blk)


@partial(jax.jit, static_argnames=("Rh", "herm_b"))
def _k_schur_dense_target(
    D, U, V, ranks, ia_cls, ia_slot, jb_cls, jb_slot, t_slot, Rh, herm_b=False
):
    """A_ij -= L_ik U_kj into dense targets, any class combo.

    ia_cls/jb_cls: [c] int32 (1 dense, 2 lr); slots index D or U/V.
    With ``herm_b`` the B operand is applied conj-transposed (the Cholesky
    Schur update A_ij -= L_ik L_jk^H, factorization.hpp:131-205)."""
    La_d = D[ia_slot]  # [c, b, b]
    La_u = U[ia_slot][:, :, :Rh]
    La_v = V[ia_slot][:, :Rh, :]
    if herm_b:
        Rb_d = jnp.conj(jnp.swapaxes(D[jb_slot], 1, 2))
        Rb_u = jnp.conj(jnp.swapaxes(V[jb_slot][:, :Rh, :], 1, 2))  # [c, b, Rh]
        Rb_v = jnp.conj(jnp.swapaxes(U[jb_slot][:, :, :Rh], 1, 2))  # [c, Rh, b]
    else:
        Rb_d = D[jb_slot]
        Rb_u = U[jb_slot][:, :, :Rh]
        Rb_v = V[jb_slot][:, :Rh, :]

    a_lr = (ia_cls == LR)[:, None, None]
    b_lr = (jb_cls == LR)[:, None, None]

    # evaluate both sides to dense equivalents lazily by combo
    # dense x dense
    dd = jnp.einsum("cij,cjk->cik", La_d, Rb_d)
    # dense x lr: (A Uu) Vv
    dl = jnp.einsum("cij,cjr,crk->cik", La_d, Rb_u, Rb_v)
    # lr x dense: Uu (Vv B)
    ld = jnp.einsum("cir,crj,cjk->cik", La_u, La_v, Rb_d)
    # lr x lr: Uu (Vv Uu') Vv'
    ll = jnp.einsum("cir,crj,cjs,csk->cik", La_u, La_v, Rb_u, Rb_v)

    contrib = jnp.where(
        a_lr & b_lr, ll, jnp.where(a_lr, ld, jnp.where(b_lr, dl, dd))
    )
    return D.at[t_slot].add(-contrib)


@partial(jax.jit, static_argnames=("Rh", "herm_b"))
def _k_schur_lr_target(
    D, U, V, ranks, ia_cls, ia_slot, jb_cls, jb_slot, t_slot, Rh, herm_b=False
):
    """A_ij -= L_ik U_kj appended into LR targets (at least one side LR)."""
    La_d = D[ia_slot]
    La_u = U[ia_slot][:, :, :Rh]
    La_v = V[ia_slot][:, :Rh, :]
    if herm_b:
        Rb_d = jnp.conj(jnp.swapaxes(D[jb_slot], 1, 2))
        Rb_u = jnp.conj(jnp.swapaxes(V[jb_slot][:, :Rh, :], 1, 2))
        Rb_v = jnp.conj(jnp.swapaxes(U[jb_slot][:, :, :Rh], 1, 2))
    else:
        Rb_d = D[jb_slot]
        Rb_u = U[jb_slot][:, :, :Rh]
        Rb_v = V[jb_slot][:, :Rh, :]
    a_lr = (ia_cls == LR)
    b_lr = (jb_cls == LR)

    # contribution factors (width R_half), by combo:
    # dl: (A Uu') , Vv'      rank rb
    # ld: Uu , (Vv B)        rank ra
    # ll: Uu , ((Vv Uu') Vv') rank min(ra, rb) (bounded by ra mask)
    Uc_dl = jnp.einsum("cij,cjr->cir", La_d, Rb_u)
    Vc_dl = Rb_v
    Uc_ld = La_u
    Vc_ld = jnp.einsum("crj,cjk->crk", La_v, Rb_d)
    W = jnp.einsum("crj,cjs->crs", La_v, Rb_u)
    Vc_ll = jnp.einsum("crs,csk->crk", W, Rb_v)

    Uc = jnp.where(
        (a_lr & b_lr)[:, None, None],
        La_u,
        jnp.where(a_lr[:, None, None], Uc_ld, Uc_dl),
    )
    Vc = jnp.where(
        (a_lr & b_lr)[:, None, None],
        Vc_ll,
        jnp.where(a_lr[:, None, None], Vc_ld, Vc_dl),
    )
    rc = jnp.where(
        a_lr & b_lr,
        jnp.minimum(ranks[ia_slot], ranks[jb_slot]),
        jnp.where(a_lr, ranks[ia_slot], ranks[jb_slot]),
    ).astype(jnp.int32)

    # append at column offset ranks[t_slot] (invariant: fits in 2*Rh buffer)
    off = ranks[t_slot]

    # vectorized append: build updated blocks then scatter back
    def upd(t, u, v, r, o, Uarr, Varr):
        z = jnp.zeros((), o.dtype)
        Ut = jax.lax.dynamic_update_slice(Uarr[t], -u, (z, o))
        Vt = jax.lax.dynamic_update_slice(Varr[t], v, (o, z))
        return Ut, Vt

    Ut, Vt = jax.vmap(upd, in_axes=(0, 0, 0, 0, 0, None, None))(
        t_slot, Uc, Vc, rc, off, U, V
    )
    U = U.at[t_slot].set(Ut)
    V = V.at[t_slot].set(Vt)
    ranks = ranks.at[t_slot].set(
        jnp.minimum(off + rc, jnp.asarray(U.shape[2], jnp.int32))
    )
    return U, V, ranks


@partial(jax.jit, static_argnames=("Rh",))
def _k_recompress(U, V, ranks, slots, epsilon, Rh):
    """Batched epsilon-truncation of touched LR cells, capped at R_half."""
    Us, Vs, rs = U[slots], V[slots], ranks[slots]
    U2, V2, r2 = batched_recompress(Us, Vs, rs, epsilon)
    r2 = jnp.minimum(r2, Rh)
    keep = jnp.arange(U.shape[2])[None, :] < r2[:, None]
    U2 = U2 * keep[:, None, :].astype(U.dtype)
    V2 = V2 * keep[:, :, None].astype(V.dtype)
    return (
        U.at[slots].set(U2),
        V.at[slots].set(V2),
        ranks.at[slots].set(r2.astype(jnp.int32)),
    )


def _pad_pow2(arr_list, dummy):
    """Pad index arrays to the next power of two with a dummy slot (bounds
    the number of distinct compiled shapes)."""
    n = len(arr_list[0])
    if n == 0:
        return None
    p = 1
    while p < n:
        p *= 2
    out = []
    for a in arr_list:
        a = np.asarray(a, np.int32)
        out.append(jnp.asarray(np.concatenate([a, np.full(p - n, dummy, np.int32)])))
    return out


# ======================================================================
# factorization
# ======================================================================


def blr_lu(A: BLRMatrix, epsilon: Optional[float] = None) -> BLRMatrix:
    """Right-looking BLR LU (the H-LU equivalent, factorization.hpp:19-79).

    Returns a new factorized BLRMatrix: diagonal cells hold their pivoted LU
    factors, subdiagonal cells hold L_ik = A_ik A_kk⁻¹, superdiagonal cells
    hold the updated U_kj = A_kj."""
    eps = A.epsilon if epsilon is None else epsilon
    nL, b, Rh = A.nL, A.b, A.R_half
    t0 = time.perf_counter()

    # ---- host symbolic pass: fill-in, upgrades, final slot allocation ----
    cls = A.cls.copy()
    densify_at = {}  # (i, j) -> step k at which lr cell becomes dense
    fill_lr_at = {}  # (i, j) -> step k at which zero cell becomes lr
    fill_dn_at = {}
    for k in range(nL):
        assert cls[k, k] == DENSE, "diagonal cells must be dense"
        for i in range(k + 1, nL):
            if cls[i, k] == ZERO:
                continue
            for j in range(k + 1, nL):
                if cls[k, j] == ZERO:
                    continue
                contrib = DENSE if (cls[i, k] == DENSE and cls[k, j] == DENSE) else LR
                if cls[i, j] == ZERO:
                    cls[i, j] = contrib
                    (fill_dn_at if contrib == DENSE else fill_lr_at)[(i, j)] = k
                elif cls[i, j] == LR and contrib == DENSE:
                    cls[i, j] = DENSE
                    densify_at[(i, j)] = k

    # final slot maps: every cell that is EVER dense gets a dense slot;
    # cells that are lr at any point keep their lr slot (or get a new one)
    dense_slot = A.dense_slot.copy()
    lr_slot = A.lr_slot.copy()
    nd = int(np.asarray(A.D).shape[0]) - 1
    nl = int(np.asarray(A.U).shape[0]) - 1
    for (i, j) in sorted(list(densify_at) + list(fill_dn_at)):
        if dense_slot[i, j] < 0:
            dense_slot[i, j] = nd
            nd += 1
    for (i, j) in sorted(fill_lr_at):
        if lr_slot[i, j] < 0:
            lr_slot[i, j] = nl
            nl += 1

    # grow arrays (+ dummy at the end)
    dtype = A.dtype
    D = jnp.concatenate(
        [A.D[:-1], jnp.zeros((nd - (A.D.shape[0] - 1) + 1, b, b), dtype)], axis=0
    )
    U = jnp.concatenate(
        [A.U[:-1], jnp.zeros((nl - (A.U.shape[0] - 1) + 1, b, A.R_buf), dtype)], axis=0
    )
    V = jnp.concatenate(
        [A.V[:-1], jnp.zeros((nl - (A.V.shape[0] - 1) + 1, A.R_buf, b), dtype)], axis=0
    )
    ranks = jnp.concatenate(
        [A.ranks[:-1], jnp.zeros((nl - (A.ranks.shape[0] - 1) + 1,), jnp.int32)]
    )
    DUMMY_D, DUMMY_L = nd, nl

    # re-simulate classes step by step while executing
    cls = A.cls.copy()
    piv_all = jnp.zeros((nL, b), jnp.int32)

    for k in range(nL):
        # 1. factor diagonal
        D, piv_k = _k_lu_diag(D, int(dense_slot[k, k]))
        lu_k = D[int(dense_slot[k, k])]
        piv_all = piv_all.at[k].set(piv_k)

        # 2. column panel transform: L_ik = A_ik A_kk^{-1}
        col_d = [int(dense_slot[i, k]) for i in range(k + 1, nL) if cls[i, k] == DENSE]
        col_l = [int(lr_slot[i, k]) for i in range(k + 1, nL) if cls[i, k] == LR]
        if col_d:
            (slots,) = _pad_pow2([col_d], DUMMY_D)
            D = _k_col_panel_dense(D, slots, lu_k, piv_k)
        if col_l:
            (slots,) = _pad_pow2([col_l], DUMMY_L)
            V = _k_col_panel_lr(V, slots, lu_k, piv_k)

        # 3. densify upgrades scheduled at this step
        dens = [(i, j) for (i, j), kk in densify_at.items() if kk == k]
        if dens:
            dsl = [int(dense_slot[i, j]) for i, j in dens]
            lsl = [int(lr_slot[i, j]) for i, j in dens]
            dslots, lslots = _pad_pow2([dsl, lsl], DUMMY_D)
            # pad the lr side with the lr dummy instead
            lslots = jnp.where(
                jnp.arange(lslots.shape[0]) < len(lsl), lslots, DUMMY_L
            )
            D = _k_densify(D, dslots, U, V, lslots)
            for i, j in dens:
                cls[i, j] = DENSE

        # new fills become live (zero-initialized slots are already zero)
        for (i, j), kk in fill_dn_at.items():
            if kk == k:
                cls[i, j] = DENSE
        for (i, j), kk in fill_lr_at.items():
            if kk == k:
                cls[i, j] = LR

        # 4. Schur updates, grouped by target class
        tgt_dense = {"ia_cls": [], "ia": [], "jb_cls": [], "jb": [], "t": []}
        tgt_lr = {"ia_cls": [], "ia": [], "jb_cls": [], "jb": [], "t": []}
        touched_lr = []
        for i in range(k + 1, nL):
            cik = cls[i, k]
            if cik == ZERO:
                continue
            ia = int(dense_slot[i, k] if cik == DENSE else lr_slot[i, k])
            for j in range(k + 1, nL):
                ckj = cls[k, j]
                if ckj == ZERO:
                    continue
                jb = int(dense_slot[k, j] if ckj == DENSE else lr_slot[k, j])
                tc = cls[i, j]
                if tc == DENSE:
                    g = tgt_dense
                    g["t"].append(int(dense_slot[i, j]))
                else:
                    g = tgt_lr
                    g["t"].append(int(lr_slot[i, j]))
                    touched_lr.append(int(lr_slot[i, j]))
                g["ia_cls"].append(cik)
                g["ia"].append(ia)
                g["jb_cls"].append(ckj)
                g["jb"].append(jb)

        if tgt_dense["t"]:
            ia_cls, ia, jb_cls, jb, t = _pad_pow2(
                [
                    tgt_dense["ia_cls"],
                    tgt_dense["ia"],
                    tgt_dense["jb_cls"],
                    tgt_dense["jb"],
                    tgt_dense["t"],
                ],
                DUMMY_D,
            )
            # dummy rows: make classes dense so they read D[dummy]=0
            npad = len(tgt_dense["t"])
            ia_cls = jnp.where(jnp.arange(ia_cls.shape[0]) < npad, ia_cls, DENSE)
            jb_cls = jnp.where(jnp.arange(jb_cls.shape[0]) < npad, jb_cls, DENSE)
            D = _k_schur_dense_target(D, U, V, ranks, ia_cls, ia, jb_cls, jb, t, Rh)
        if tgt_lr["t"]:
            npad = len(tgt_lr["t"])
            ia_cls, jb_cls = _pad_pow2([tgt_lr["ia_cls"], tgt_lr["jb_cls"]], DENSE)
            ia = _pad_pow2([tgt_lr["ia"]], DUMMY_D)[0]
            jb = _pad_pow2([tgt_lr["jb"]], DUMMY_D)[0]
            t = _pad_pow2([tgt_lr["t"]], DUMMY_L)[0]
            # fix dummy entries: dense class + dummy dense slot -> zero contribs
            ia = jnp.where(jnp.arange(ia.shape[0]) < npad, ia, DUMMY_D)
            jb = jnp.where(jnp.arange(jb.shape[0]) < npad, jb, DUMMY_D)
            U, V, ranks = _k_schur_lr_target(
                D, U, V, ranks, ia_cls, ia, jb_cls, jb, t, Rh
            )
            # 5. recompress touched lr targets back to rank <= R_half
            sl = sorted(set(touched_lr))
            (slots,) = _pad_pow2([sl], DUMMY_L)
            U, V, ranks = _k_recompress(U, V, ranks, slots, eps, Rh)

    out = BLRMatrix(
        n=A.n,
        cell_off=A.cell_off,
        cell_size=A.cell_size,
        b=b,
        cls=cls,
        dense_slot=dense_slot,
        lr_slot=lr_slot,
        D=D,
        U=U,
        V=V,
        ranks=ranks,
        piv=piv_all,
        R_half=Rh,
        epsilon=eps,
        factorized=True,
        permutation=A.permutation,
        info=dict(A.info),
    )
    out.info["lu_walltime"] = time.perf_counter() - t0
    return out


def blr_cholesky(A: BLRMatrix, epsilon: Optional[float] = None) -> BLRMatrix:
    """Right-looking BLR Cholesky A = L·L^H — the H-Cholesky equivalent
    (``factorization.hpp:131-205``): per step k factor the diagonal cell
    (potrf), transform the subdiagonal column panel L_ik = A_ik L_kk^{-H},
    then Schur-update the trailing LOWER triangle A_ij -= L_ik L_jk^H.

    Only the lower triangle of ``A`` is read (real symmetric or complex
    hermitian positive definite, matching LAPACK potrf); the returned matrix
    stores L in the lower triangle and zeros the upper class map."""
    eps = A.epsilon if epsilon is None else epsilon
    nL, b, Rh = A.nL, A.b, A.R_half
    t0 = time.perf_counter()

    # ---- host symbolic pass on the lower triangle ----
    cls = A.cls.copy()
    for i in range(nL):
        for j in range(i + 1, nL):
            cls[i, j] = ZERO  # upper triangle unused
    densify_at = {}
    fill_lr_at = {}
    fill_dn_at = {}
    for k in range(nL):
        assert cls[k, k] == DENSE, "diagonal cells must be dense"
        for i in range(k + 1, nL):
            if cls[i, k] == ZERO:
                continue
            for j in range(k + 1, i + 1):
                if cls[j, k] == ZERO:
                    continue
                contrib = DENSE if (cls[i, k] == DENSE and cls[j, k] == DENSE) else LR
                if cls[i, j] == ZERO:
                    cls[i, j] = contrib
                    (fill_dn_at if contrib == DENSE else fill_lr_at)[(i, j)] = k
                elif cls[i, j] == LR and contrib == DENSE:
                    cls[i, j] = DENSE
                    densify_at[(i, j)] = k

    dense_slot = A.dense_slot.copy()
    lr_slot = A.lr_slot.copy()
    nd = int(np.asarray(A.D).shape[0]) - 1
    nl = int(np.asarray(A.U).shape[0]) - 1
    for (i, j) in sorted(list(densify_at) + list(fill_dn_at)):
        if dense_slot[i, j] < 0:
            dense_slot[i, j] = nd
            nd += 1
    for (i, j) in sorted(fill_lr_at):
        if lr_slot[i, j] < 0:
            lr_slot[i, j] = nl
            nl += 1

    dtype = A.dtype
    D = jnp.concatenate(
        [A.D[:-1], jnp.zeros((nd - (A.D.shape[0] - 1) + 1, b, b), dtype)], axis=0
    )
    U = jnp.concatenate(
        [A.U[:-1], jnp.zeros((nl - (A.U.shape[0] - 1) + 1, b, A.R_buf), dtype)], axis=0
    )
    V = jnp.concatenate(
        [A.V[:-1], jnp.zeros((nl - (A.V.shape[0] - 1) + 1, A.R_buf, b), dtype)], axis=0
    )
    ranks = jnp.concatenate(
        [A.ranks[:-1], jnp.zeros((nl - (A.ranks.shape[0] - 1) + 1,), jnp.int32)]
    )
    DUMMY_D, DUMMY_L = nd, nl

    # re-simulate classes while executing (lower triangle only)
    cls = A.cls.copy()
    for i in range(nL):
        for j in range(i + 1, nL):
            cls[i, j] = ZERO

    for k in range(nL):
        # 1. factor diagonal (potrf)
        D = _k_chol_diag(D, int(dense_slot[k, k]))
        L_k = D[int(dense_slot[k, k])]

        # 2. column panel: L_ik = A_ik L_kk^{-H}
        col_d = [int(dense_slot[i, k]) for i in range(k + 1, nL) if cls[i, k] == DENSE]
        col_l = [int(lr_slot[i, k]) for i in range(k + 1, nL) if cls[i, k] == LR]
        if col_d:
            (slots,) = _pad_pow2([col_d], DUMMY_D)
            D = _k_col_panel_dense_chol(D, slots, L_k)
        if col_l:
            (slots,) = _pad_pow2([col_l], DUMMY_L)
            V = _k_col_panel_lr_chol(V, slots, L_k)

        # 3. densify upgrades
        dens = [(i, j) for (i, j), kk in densify_at.items() if kk == k]
        if dens:
            dsl = [int(dense_slot[i, j]) for i, j in dens]
            lsl = [int(lr_slot[i, j]) for i, j in dens]
            dslots, lslots = _pad_pow2([dsl, lsl], DUMMY_D)
            lslots = jnp.where(jnp.arange(lslots.shape[0]) < len(lsl), lslots, DUMMY_L)
            D = _k_densify(D, dslots, U, V, lslots)
            for i, j in dens:
                cls[i, j] = DENSE
        for (i, j), kk in fill_dn_at.items():
            if kk == k:
                cls[i, j] = DENSE
        for (i, j), kk in fill_lr_at.items():
            if kk == k:
                cls[i, j] = LR

        # 4. Schur updates on the trailing LOWER triangle: A_ij -= L_ik L_jk^H
        tgt_dense = {"ia_cls": [], "ia": [], "jb_cls": [], "jb": [], "t": []}
        tgt_lr = {"ia_cls": [], "ia": [], "jb_cls": [], "jb": [], "t": []}
        touched_lr = []
        for i in range(k + 1, nL):
            cik = cls[i, k]
            if cik == ZERO:
                continue
            ia = int(dense_slot[i, k] if cik == DENSE else lr_slot[i, k])
            for j in range(k + 1, i + 1):
                cjk = cls[j, k]
                if cjk == ZERO:
                    continue
                jb = int(dense_slot[j, k] if cjk == DENSE else lr_slot[j, k])
                tc = cls[i, j]
                if tc == DENSE:
                    g = tgt_dense
                    g["t"].append(int(dense_slot[i, j]))
                else:
                    g = tgt_lr
                    g["t"].append(int(lr_slot[i, j]))
                    touched_lr.append(int(lr_slot[i, j]))
                g["ia_cls"].append(cik)
                g["ia"].append(ia)
                g["jb_cls"].append(cjk)
                g["jb"].append(jb)

        if tgt_dense["t"]:
            ia_cls, ia, jb_cls, jb, t = _pad_pow2(
                [
                    tgt_dense["ia_cls"],
                    tgt_dense["ia"],
                    tgt_dense["jb_cls"],
                    tgt_dense["jb"],
                    tgt_dense["t"],
                ],
                DUMMY_D,
            )
            npad = len(tgt_dense["t"])
            ia_cls = jnp.where(jnp.arange(ia_cls.shape[0]) < npad, ia_cls, DENSE)
            jb_cls = jnp.where(jnp.arange(jb_cls.shape[0]) < npad, jb_cls, DENSE)
            D = _k_schur_dense_target(
                D, U, V, ranks, ia_cls, ia, jb_cls, jb, t, Rh, herm_b=True
            )
        if tgt_lr["t"]:
            npad = len(tgt_lr["t"])
            ia_cls, jb_cls = _pad_pow2([tgt_lr["ia_cls"], tgt_lr["jb_cls"]], DENSE)
            ia = _pad_pow2([tgt_lr["ia"]], DUMMY_D)[0]
            jb = _pad_pow2([tgt_lr["jb"]], DUMMY_D)[0]
            t = _pad_pow2([tgt_lr["t"]], DUMMY_L)[0]
            ia = jnp.where(jnp.arange(ia.shape[0]) < npad, ia, DUMMY_D)
            jb = jnp.where(jnp.arange(jb.shape[0]) < npad, jb, DUMMY_D)
            U, V, ranks = _k_schur_lr_target(
                D, U, V, ranks, ia_cls, ia, jb_cls, jb, t, Rh, herm_b=True
            )
            sl = sorted(set(touched_lr))
            (slots,) = _pad_pow2([sl], DUMMY_L)
            U, V, ranks = _k_recompress(U, V, ranks, slots, eps, Rh)

    out = BLRMatrix(
        n=A.n,
        cell_off=A.cell_off,
        cell_size=A.cell_size,
        b=b,
        cls=cls,
        dense_slot=dense_slot,
        lr_slot=lr_slot,
        D=D,
        U=U,
        V=V,
        ranks=ranks,
        piv=None,
        R_half=Rh,
        epsilon=eps,
        factorized=True,
        kind="chol",
        permutation=A.permutation,
        info=dict(A.info),
    )
    out.info["cholesky_walltime"] = time.perf_counter() - t0
    return out


# ======================================================================
# solve and products
# ======================================================================


def blr_solve(F: BLRMatrix, rhs, user_numbering: bool = False):
    """Solve A x = rhs with a factorized BLR matrix (the lu_solve
    equivalent, factorization.hpp:119-128): forward sweep on the unit-lower
    block L, backward sweep on block U with the diagonal LU factors."""
    if not F.factorized:
        raise ValueError("matrix is not factorized; call blr_lu first")
    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    if user_numbering:
        inv = np.empty(F.n, np.int64)
        inv[F.permutation] = np.arange(F.n)
        rhs = rhs[jnp.asarray(F.permutation)]
    nL, b = F.nL, F.b
    k = rhs.shape[1]
    dtype = jnp.result_type(F.dtype, rhs.dtype)

    # pad rhs into cells [nL, b, k]
    y = jnp.zeros((nL, b, k), dtype)
    for i in range(nL):
        off, sz = int(F.cell_off[i]), int(F.cell_size[i])
        y = y.at[i, :sz].set(rhs[off : off + sz].astype(dtype))

    rk = F.ranks
    Rh = F.R_half

    def cell_apply(i, j, x):
        c = F.cls[i, j]
        if c == DENSE:
            return F.D[int(F.dense_slot[i, j])] @ x
        s = int(F.lr_slot[i, j])
        return F.U[s][:, :Rh] @ (F.V[s][:Rh, :] @ x)

    def cell_apply_H(i, j, x):
        """Apply cell (i, j) conj-transposed: L_ij^H x."""
        c = F.cls[i, j]
        if c == DENSE:
            return jnp.conj(F.D[int(F.dense_slot[i, j])]).T @ x
        s = int(F.lr_slot[i, j])
        return jnp.conj(F.V[s][:Rh, :]).T @ (jnp.conj(F.U[s][:, :Rh]).T @ x)

    if F.kind == "chol":
        # forward: L y = b with non-unit lower-triangular diagonal cells
        for i in range(nL):
            acc = jnp.zeros((b, k), dtype)
            for j in range(i):
                if F.cls[i, j] != ZERO:
                    acc = acc + cell_apply(i, j, y[j])
            L_i = F.D[int(F.dense_slot[i, i])]
            yi = jax.scipy.linalg.solve_triangular(L_i, y[i] - acc, lower=True)
            y = y.at[i].set(yi.astype(dtype))
        # backward: L^H x = y, using the stored lower cells conj-transposed
        x = jnp.zeros_like(y)
        for i in range(nL - 1, -1, -1):
            acc = jnp.zeros((b, k), dtype)
            for j in range(i + 1, nL):
                if F.cls[j, i] != ZERO:
                    acc = acc + cell_apply_H(j, i, x[j])
            L_i = F.D[int(F.dense_slot[i, i])]
            xi = jax.scipy.linalg.solve_triangular(
                L_i, y[i] - acc, lower=True, trans=2
            )
            x = x.at[i].set(xi.astype(dtype))
    else:
        # forward: y_i -= sum_{j<i} L_ij y_j  (L has unit diagonal)
        for i in range(1, nL):
            acc = jnp.zeros((b, k), dtype)
            for j in range(i):
                if F.cls[i, j] != ZERO:
                    acc = acc + cell_apply(i, j, y[j])
            y = y.at[i].add(-acc)

        # backward: x_i = U_ii^{-1} (y_i - sum_{j>i} U_ij x_j)
        x = jnp.zeros_like(y)
        for i in range(nL - 1, -1, -1):
            acc = jnp.zeros((b, k), dtype)
            for j in range(i + 1, nL):
                if F.cls[i, j] != ZERO:
                    acc = acc + cell_apply(i, j, x[j])
            lu_i = F.D[int(F.dense_slot[i, i])]
            xi = jax.scipy.linalg.lu_solve((lu_i, F.piv[i]), y[i] - acc)
            x = x.at[i].set(xi.astype(dtype))

    # compact
    out = jnp.zeros((F.n, k), dtype)
    for i in range(nL):
        off, sz = int(F.cell_off[i]), int(F.cell_size[i])
        out = out.at[off : off + sz].set(x[i, :sz])
    if user_numbering:
        out = jnp.zeros_like(out).at[jnp.asarray(F.permutation)].set(out)
    return out[:, 0] if squeeze else out


def blr_matvec(A: BLRMatrix, x):
    """y = A x in cluster numbering (dense oracle for tests)."""
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    nL, b, Rh = A.nL, A.b, A.R_half
    k = x.shape[1]
    dtype = jnp.result_type(A.dtype, x.dtype)
    xc = jnp.zeros((nL, b, k), dtype)
    for j in range(nL):
        off, sz = int(A.cell_off[j]), int(A.cell_size[j])
        xc = xc.at[j, :sz].set(x[off : off + sz].astype(dtype))
    yc = jnp.zeros((nL, b, k), dtype)
    for i in range(nL):
        acc = jnp.zeros((b, k), dtype)
        for j in range(nL):
            c = A.cls[i, j]
            if c == ZERO:
                continue
            if c == DENSE:
                acc = acc + A.D[int(A.dense_slot[i, j])] @ xc[j]
            else:
                s = int(A.lr_slot[i, j])
                acc = acc + A.U[s][:, :Rh] @ (A.V[s][:Rh, :] @ xc[j])
        yc = yc.at[i].set(acc)
    out = jnp.zeros((A.n, k), dtype)
    for i in range(nL):
        off, sz = int(A.cell_off[i]), int(A.cell_size[i])
        out = out.at[off : off + sz].set(yc[i, :sz])
    return out[:, 0] if squeeze else out


def blr_matmul(A: BLRMatrix, B: BLRMatrix, epsilon: Optional[float] = None) -> BLRMatrix:
    """C = A·B in BLR form — the compressed×compressed product
    (internal_add_hmatrix_hmatrix_product, add_hmatrix_hmatrix_product.hpp:
    24-312) with truncated low-rank accumulation.

    Both operands must share the same grid."""
    if A.nL != B.nL or A.b != B.b:
        raise ValueError("BLR product requires matching grids")
    eps = A.epsilon if epsilon is None else epsilon
    nL, b, Rh = A.nL, A.b, max(A.R_half, B.R_half)

    # symbolic: C classification
    clsC = np.zeros((nL, nL), np.int8)
    for i in range(nL):
        for j in range(nL):
            for k in range(nL):
                a, c = A.cls[i, k], B.cls[k, j]
                if a == ZERO or c == ZERO:
                    continue
                contrib = DENSE if (a == DENSE and c == DENSE) else LR
                if clsC[i, j] == ZERO:
                    clsC[i, j] = contrib
                elif contrib == DENSE:
                    clsC[i, j] = DENSE

    dense_slot = np.full((nL, nL), -1, np.int32)
    lr_slot = np.full((nL, nL), -1, np.int32)
    nd = nl = 0
    for i in range(nL):
        for j in range(nL):
            if clsC[i, j] == DENSE:
                dense_slot[i, j] = nd
                nd += 1
            elif clsC[i, j] == LR:
                lr_slot[i, j] = nl
                nl += 1
    dtype = jnp.result_type(A.dtype, B.dtype)
    R_buf = 2 * Rh
    D = jnp.zeros((nd + 1, b, b), dtype)
    U = jnp.zeros((nl + 1, b, R_buf), dtype)
    V = jnp.zeros((nl + 1, R_buf, b), dtype)
    ranks = jnp.zeros((nl + 1,), jnp.int32)
    C = BLRMatrix(
        n=A.n,
        cell_off=A.cell_off,
        cell_size=A.cell_size,
        b=b,
        cls=clsC,
        dense_slot=dense_slot,
        lr_slot=lr_slot,
        D=D,
        U=U,
        V=V,
        ranks=ranks,
        R_half=Rh,
        epsilon=eps,
        permutation=A.permutation,
    )
    return _blr_matmul_simple(A, B, C, eps)


def _cell_dense(M: BLRMatrix, i, j):
    c = M.cls[i, j]
    if c == ZERO:
        return None
    if c == DENSE:
        return M.D[int(M.dense_slot[i, j])]
    s = int(M.lr_slot[i, j])
    return M.U[s][:, : M.R_half] @ M.V[s][: M.R_half, :]


def _blr_matmul_simple(A: BLRMatrix, B: BLRMatrix, C: BLRMatrix, eps):
    """Reference-style evaluation: per target cell, accumulate products.
    Dense targets accumulate dense; LR targets accumulate factor pairs then
    recompress once."""
    nL, b, Rh = A.nL, A.b, C.R_half
    D, U, V, ranks = C.D, C.U, C.V, C.ranks
    for i in range(nL):
        for j in range(nL):
            tc = C.cls[i, j]
            if tc == ZERO:
                continue
            acc = jnp.zeros((b, b), C.dtype)
            for k in range(nL):
                if A.cls[i, k] == ZERO or B.cls[k, j] == ZERO:
                    continue
                acc = acc + _cell_dense(A, i, k) @ _cell_dense(B, k, j)
            if tc == DENSE:
                D = D.at[int(C.dense_slot[i, j])].set(acc)
            else:
                # compress the accumulated cell at epsilon
                Uf, s, Vh = jnp.linalg.svd(acc, full_matrices=False)
                r = jnp.minimum(svd_truncation_rank(s[None], eps)[0], Rh)
                w = min(int(s.shape[0]), C.R_buf)
                keep = jnp.arange(w) < r
                sv = jnp.where(keep, s[:w], 0)
                sl = int(C.lr_slot[i, j])
                U = U.at[sl, :, :w].set((Uf[:, :w] * sv[None, :]).astype(C.dtype))
                V = V.at[sl, :w, :].set(Vh[:w].astype(C.dtype))
                ranks = ranks.at[sl].set(r.astype(jnp.int32))
    C.D, C.U, C.V, C.ranks = D, U, V, ranks
    return C
