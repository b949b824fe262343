"""Genuinely distributed DDM solve — the whole Krylov iteration sharded.

TPU-native equivalent of the reference's HPDDM-driven solve on local slices
(``solvers/ddm.hpp:183-214`` + ``wrappers/wrapper_hpddm.hpp:102-149``): the
reference gives HPDDM only the rank's rhs slice, performs the GMV through
the distributed l2l product plus a point-to-point neighbor ``exchange`` over
subdomain intersections, applies the Schwarz preconditioner with rank-local
subdomain solves, and completes dot products with MPI_Allreduce.

Here ONE ``shard_map`` wraps the entire solve:

- Krylov vectors are per-device interior slices ``[m_loc_max, k]`` — the
  basis and preconditioner state are O(N/P) per device;
- global dot products are ``psum`` over the mesh axis
  (:func:`..solvers.krylov.cg`/``gmres`` with ``axis_name=``);
- the halo exchange over precomputed subdomain-intersection index sets runs
  as a static sequence of ``ppermute`` rounds (one per color of the
  edge-colored neighbor graph) — the ``exchange``/``scaledexchange`` of
  wrapper_hpddm.hpp:140-149 mapped to ICI collectives (SURVEY.md §5);
- Schwarz subdomain solves execute device-locally inside the shard_map:
  the dense mode is the prefactorized local LU
  (``solvers/local_solvers/local_dense_solvers.hpp``), the BLR mode stacks
  per-subdomain compressed LU factors padded to a common shape and runs the
  scanned block-triangular sweeps of :mod:`..hmatrix.blr` on each device
  (``local_hmatrix_solvers.hpp:14-85``);
- the GenEO coarse correction applies on local slices with one psum for
  Z^H r and a replicated small solve (``coarse_operator_builder.hpp``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..clustering.cluster_tree import ClusterTree
from ..generator import Generator
from ..hmatrix.hmatrix import DenseBucket, LowRankBucket
from ..hmatrix.linalg import matvec as _local_matvec
from ..parallel.distributed import DistributedHMatrix
from .ddm import build_geometric_overlap
from .krylov import KrylovResult, cg, gmres

__all__ = ["HaloExchange", "DistributedDDMSolver", "build_halo_exchange"]


# ======================================================================
# halo exchange plan (host) + device apply
# ======================================================================


@dataclass
class HaloExchange:
    """Static ppermute schedule for subdomain-intersection exchange.

    Built on host from the overlap decomposition: directed edges
    (owner q -> borrower p) carry the values of q's interior rows that lie
    in p's overlap.  Edges are greedily colored so that within a color every
    device is the source of at most one edge and the destination of at most
    one edge — each color is then a single ``ppermute`` of an ``[H_max, k]``
    packed buffer (the reference's point-to-point ``exchange``,
    wrapper_hpddm.hpp:140).
    """

    P: int
    m_loc_max: int  # interior slice pad
    n_ext_max: int  # interior+overlap pad
    n_colors: int
    perms: tuple  # per color: tuple of (src, dst) pairs
    # per color c: send rows (interior-local) and receive positions (ext),
    # [C, P, H_max]; pads: send->row 0, recv->trash row n_ext_max
    send_idx: Any
    recv_pos: Any
    # layout maps, [P, n_ext_max] / [P, m_loc_max]
    ext_src: Any  # ext position -> interior-local row (m_loc_max = zero)
    int_src: Any  # interior-local row -> ext position (n_ext_max = zero)
    ext_sizes: np.ndarray = None  # host [P]

    @property
    def H_max(self) -> int:
        return int(np.asarray(self.send_idx).shape[-1])


def build_halo_exchange(
    tree: ClusterTree, overlap: list[np.ndarray]
) -> HaloExchange:
    """Host plan: per-partition ext layout [interior; overlap] and the
    colored intersection exchange (the data the reference loads as
    ``neighbors_*`` / ``intersections_*``, test_solver_ddm.hpp:110-183)."""
    offs, sizes = tree.partition_offsets_sizes()
    Pn = tree.n_partitions
    m_loc_max = int(sizes.max())

    ext_idx = []
    for p in range(Pn):
        off, sz = int(offs[p]), int(sizes[p])
        ov = np.asarray(overlap[p], np.int64) if overlap is not None else np.zeros(0, np.int64)
        ext_idx.append(np.concatenate([np.arange(off, off + sz), ov]))
    n_ext_max = max(int(e.size) for e in ext_idx)

    # directed edges (q -> p): values of q's interior needed by p's overlap
    edges = []  # (src q, dst p, send_local_rows, recv_ext_positions)
    for p in range(Pn):
        sz = int(sizes[p])
        ov = ext_idx[p][sz:]
        if ov.size == 0:
            continue
        owner = np.searchsorted(offs, ov, side="right") - 1
        for q in np.unique(owner):
            sel = np.nonzero(owner == q)[0]
            send_rows = ov[sel] - int(offs[q])  # interior-local rows in q
            recv_pos = sz + sel  # ext positions in p
            edges.append((int(q), int(p), send_rows, recv_pos))

    # greedy edge coloring: per color, distinct sources and destinations
    colors: list[list] = []
    for e in edges:
        q, p = e[0], e[1]
        for c in colors:
            if all(q != e2[0] and p != e2[1] for e2 in c):
                c.append(e)
                break
        else:
            colors.append([e])
    C = max(1, len(colors))
    H_max = max((len(e[2]) for e in edges), default=1)

    send_idx = np.zeros((C, Pn, H_max), np.int32)
    recv_pos = np.full((C, Pn, H_max), n_ext_max, np.int32)
    perms = []
    for ci in range(C):
        group = colors[ci] if ci < len(colors) else []
        perms.append(tuple((e[0], e[1]) for e in group))
        for q, p, srows, rpos in group:
            send_idx[ci, q, : srows.size] = srows
            recv_pos[ci, p, : rpos.size] = rpos

    ext_src = np.full((Pn, n_ext_max), m_loc_max, np.int32)
    int_src = np.full((Pn, m_loc_max), n_ext_max, np.int32)
    for p in range(Pn):
        sz = int(sizes[p])
        ext_src[p, :sz] = np.arange(sz)
        int_src[p, :sz] = np.arange(sz)

    return HaloExchange(
        P=Pn,
        m_loc_max=m_loc_max,
        n_ext_max=n_ext_max,
        n_colors=C,
        perms=tuple(perms),
        send_idx=jnp.asarray(send_idx),
        recv_pos=jnp.asarray(recv_pos),
        ext_src=jnp.asarray(ext_src),
        int_src=jnp.asarray(int_src),
        ext_sizes=np.array([e.size for e in ext_idx]),
    )


def _halo_gather(halo: HaloExchange, axis_name: str, r_int, send_idx, recv_pos, ext_src):
    """Device-local: build the extended-subdomain slice from the interior
    slice + neighbor values (forward exchange).  r_int [m_loc_max, k] ->
    r_ext [n_ext_max, k] (with pads zero)."""
    k = r_int.shape[1]
    r_pad = jnp.concatenate([r_int, jnp.zeros((1, k), r_int.dtype)], axis=0)
    r_ext = jnp.concatenate(
        [r_pad[ext_src], jnp.zeros((1, k), r_int.dtype)], axis=0
    )  # [n_ext_max + 1, k], trash last
    for c in range(halo.n_colors):
        if not halo.perms[c]:
            continue
        buf = r_int[send_idx[c]]  # [H_max, k]
        got = jax.lax.ppermute(buf, axis_name, halo.perms[c])
        r_ext = r_ext.at[recv_pos[c]].set(got)
    return r_ext[:-1]


def _halo_scatter_add(halo: HaloExchange, axis_name: str, z_ext, z_int, send_idx, recv_pos):
    """Device-local reverse exchange: send overlap contributions back to
    their owner's interior rows and ADD (the ASM Σ Rᵢᵀ term)."""
    k = z_ext.shape[1]
    z_ext_pad = jnp.concatenate([z_ext, jnp.zeros((1, k), z_ext.dtype)], axis=0)
    for c in range(halo.n_colors):
        if not halo.perms[c]:
            continue
        rev = tuple((dst, src) for (src, dst) in halo.perms[c])
        buf = z_ext_pad[recv_pos[c]]  # what I borrowed, going home
        got = jax.lax.ppermute(buf, axis_name, rev)
        z_int = z_int.at[send_idx[c]].add(got)
    return z_int


# ======================================================================
# stacked BLR local solver (compressed subdomain factorizations)
# ======================================================================


@dataclass
class StackedBLRFactors:
    """Per-subdomain factorized BLR matrices padded to one common shape so a
    device executes ITS subdomain's scanned triangular sweeps inside
    shard_map (the LocalHMatrixSolver role, local_hmatrix_solvers.hpp:14-85).

    All leading dims are [P, ...]; slot tables reference each device's OWN
    slot numbering (data, not structure)."""

    B: int  # common cell size
    nL: int  # common cell count (padded)
    Rh: int  # common rank slice
    D: Any  # [P, ndm, B, B]
    U: Any  # [P, nlm, B, Rb]
    V: Any  # [P, nlm, Rb, B]
    piv: Any  # [P, nL, B] int32
    pad_idx: Any  # [P, nL, B] int32 into ext rows (n_ext = trash)
    mask: Any  # [P, nL, B] bool
    cells2ext: Any  # [P, n_ext_max] int32 into flattened cells
    # sweep tables, [P, nL, ...]
    fwd: tuple  # (order, dsl, dj, lsl, lj, dgs)
    bwd: tuple


def _stack_blr_factors(factors: list, n_ext_max: int) -> StackedBLRFactors:
    from ..hmatrix.blr import _sweep_tables

    Pn = len(factors)
    B = max(f.b for f in factors)
    nL = max(f.nL for f in factors)
    Rh = max(f.R_half for f in factors)
    Rb = 2 * Rh
    ndm = max(int(np.asarray(f.D).shape[0]) for f in factors) + 1  # +identity
    nlm = max(int(np.asarray(f.U).shape[0]) for f in factors)
    dtype = np.result_type(*[np.asarray(jnp.zeros((), f.dtype)).dtype for f in factors])

    D = np.zeros((Pn, ndm, B, B), dtype)
    U = np.zeros((Pn, nlm, B, Rb), dtype)
    V = np.zeros((Pn, nlm, Rb, B), dtype)
    piv = np.tile(np.arange(B, dtype=np.int32), (Pn, nL, 1))
    pad_idx = np.full((Pn, nL, B), n_ext_max, np.int32)
    mask = np.zeros((Pn, nL, B), bool)
    cells2ext = np.zeros((Pn, n_ext_max), np.int32)
    fwd_tabs, bwd_tabs = [], []

    for p, F in enumerate(factors):
        b, nl_p = F.b, F.nL
        nd_p = int(np.asarray(F.D).shape[0])
        # identity-extend diagonal factor cells to B (lu of the padded
        # identity block is the identity with unit pivots)
        Dp = np.zeros((nd_p, B, B), dtype)
        Dp[:, :b, :b] = np.asarray(F.D)
        diag_slots = {int(F.dense_slot[i, i]) for i in range(nl_p)}
        for s in diag_slots:
            Dp[s, np.arange(b, B), np.arange(b, B)] = 1.0
        D[p, :nd_p] = Dp
        # the identity cell (diag op of padded no-op sweep rows)
        D[p, ndm - 1] = np.eye(B, dtype=dtype)
        Up = np.asarray(F.U)
        Vp = np.asarray(F.V)
        U[p, : Up.shape[0], :b, : Up.shape[2]] = Up
        V[p, : Vp.shape[0], : Vp.shape[1], :b] = Vp
        if F.piv is not None:
            piv[p, :nl_p, :b] = np.asarray(F.piv)

        # layout maps: BLR cells are ranges of the subdomain's CLUSTER
        # ordering; the solve runs in the subdomain's ext-row ordering, so
        # compose with the subdomain permutation (cluster -> ext row).
        perm = np.asarray(F.permutation, np.int64)  # cluster -> ext row
        for i in range(nl_p):
            off, sz = int(F.cell_off[i]), int(F.cell_size[i])
            pad_idx[p, i, :sz] = perm[off : off + sz]
            mask[p, i, :sz] = True
            cells2ext[p, perm[off : off + sz]] = i * B + np.arange(sz)

        ft = _sweep_tables(F, "L", "N")
        bt = _sweep_tables(F, "U", "N")
        fwd_tabs.append(ft)
        bwd_tabs.append(bt)

    def stack_tabs(tabs, bwd=False):
        order = np.full((Pn, nL), nL, np.int32)  # pad steps -> trash row
        Wd = max(t[1].shape[1] for t in tabs)
        Wl = max(t[3].shape[1] for t in tabs)
        dsl = np.zeros((Pn, nL, Wd), np.int32)
        dj = np.zeros((Pn, nL, Wd), np.int32)
        lsl = np.zeros((Pn, nL, Wl), np.int32)
        lj = np.zeros((Pn, nL, Wl), np.int32)
        dgs = np.full((Pn, nL), ndm - 1, np.int32)  # pad diag -> identity
        for p, (o, ds, djp, ls, ljp, dg) in enumerate(tabs):
            nl_p = o.shape[0]
            F = factors[p]
            dummy_d = int(np.asarray(F.D).shape[0]) - 1
            dummy_l = int(np.asarray(F.U).shape[0]) - 1
            order[p, :nl_p] = o
            dsl[p] = dummy_d
            lsl[p] = dummy_l
            dsl[p, :nl_p, : ds.shape[1]] = ds
            dj[p, :nl_p, : djp.shape[1]] = djp
            lsl[p, :nl_p, : ls.shape[1]] = ls
            lj[p, :nl_p, : ljp.shape[1]] = ljp
            dgs[p, :nl_p] = dg
        return tuple(jnp.asarray(a) for a in (order, dsl, dj, lsl, lj, dgs))

    return StackedBLRFactors(
        B=B,
        nL=nL,
        Rh=Rh,
        D=jnp.asarray(D),
        U=jnp.asarray(U),
        V=jnp.asarray(V),
        piv=jnp.asarray(piv),
        pad_idx=jnp.asarray(pad_idx),
        mask=jnp.asarray(mask),
        cells2ext=jnp.asarray(cells2ext),
        fwd=stack_tabs(fwd_tabs),
        bwd=stack_tabs(bwd_tabs),
    )


def _blr_local_solve(sf: StackedBLRFactors, D, U, V, piv, pad_idx, mask,
                     cells2ext, fwd, bwd, r_ext):
    """Device-local compressed solve on the ext slice (one device's slice of
    the stacked arrays; all leading [P] dims already consumed)."""
    from ..hmatrix.blr import _k_block_sweep

    k = r_ext.shape[1]
    r_pad = jnp.concatenate([r_ext, jnp.zeros((1, k), r_ext.dtype)], axis=0)
    y = jnp.where(mask[:, :, None], r_pad[pad_idx], 0)  # [nL, B, k]
    y = jnp.concatenate([y, jnp.zeros((1, sf.B, k), y.dtype)], axis=0)  # trash row

    def sweep(y, tabs, diag):
        order, dsl, dj, lsl, lj, dgs = tabs
        piv_g = piv[order.clip(0, piv.shape[0] - 1)]
        return _k_block_sweep(
            D, U, V, piv_g, y, order, dsl, dj, lsl, lj, dgs,
            sf.Rh, False, False, diag,
        )

    y = sweep(y, fwd, "none")
    y = sweep(y, bwd, "lu")
    return y[:-1].reshape(sf.nL * sf.B, k)[cells2ext]


# ======================================================================
# solver
# ======================================================================


class DistributedDDMSolver:
    """Sharded one/two-level Schwarz-preconditioned Krylov solve over the
    device mesh of a :class:`DistributedHMatrix` — the ``DDM::solve`` path
    (ddm.hpp:127-230) with per-device memory O(N/P + halo) for all Krylov
    and preconditioner state.

    ``schwarz``: 'none' | 'jacobi' | 'asm' | 'ras'.  ``local_solver``:
    'dense' (prefactorized LU per subdomain) or 'blr' (compressed LU,
    scanned sweeps).  ``coarse``: optional GeneoCoarseSpace.
    """

    def __init__(
        self,
        dop: DistributedHMatrix,
        generator: Generator,
        tree: ClusterTree,
        schwarz: str = "ras",
        overlap: Optional[list[np.ndarray]] = None,
        overlap_radius: float = 0.0,
        coarse=None,
        coarse_correction: str = "additive",
        local_solver: str = "dense",
        blr_epsilon: float = 1e-6,
        blr_block_size: int = 256,
    ):
        if dop.shape[0] != dop.shape[1]:
            raise ValueError("DDM solve requires a square operator")
        self.dop = dop
        self.tree = tree
        self.schwarz = schwarz
        self.coarse = coarse
        self.coarse_correction = coarse_correction
        self.infos: dict = {
            "Precond": schwarz,
            "Nb_subdomains": tree.n_partitions,
            "Local_solver": local_solver if schwarz != "none" else "-",
        }
        mesh, ax = dop.mesh, dop.axis_name
        Pn = dop.n_partitions
        offs, sizes = tree.partition_offsets_sizes()

        t0 = time.perf_counter()
        if schwarz == "none":
            self.halo = None
            self._mode = "none"
        elif schwarz in ("jacobi", "asm", "ras"):
            if overlap is None and overlap_radius > 0 and schwarz in ("asm", "ras"):
                overlap = build_geometric_overlap(tree, overlap_radius)
            if schwarz == "jacobi" or overlap is None:
                overlap = [np.zeros(0, np.int64) for _ in range(Pn)]
            self.halo = build_halo_exchange(tree, overlap)
            self._mode = local_solver
            perm = tree.permutation
            if local_solver == "dense":
                self._setup_dense(generator, tree, overlap, perm)
            elif local_solver == "blr":
                self._setup_blr(
                    generator, tree, overlap, perm, blr_epsilon, blr_block_size
                )
            else:
                raise ValueError(f"unknown local solver {local_solver!r}")
        else:
            raise ValueError(f"unknown schwarz variant {schwarz!r}")
        self.infos["Facto_one_level_walltime"] = time.perf_counter() - t0
        if coarse is not None:
            self.infos["Coarse_correction"] = coarse_correction
            self.infos["Coarse_size"] = int(coarse.size)
            if coarse.Z_loc is not None:
                # sharded GenEO store: per-device COMPACT columns
                # [m_loc_max, nu_max]; device p's coarse slots are
                # [p*nu_max, (p+1)*nu_max) — nothing [N, nc]-sized exists
                Zc = np.asarray(coarse.Z_loc)
                sz_max = Zc.shape[1]
                if sz_max < dop.m_loc_max:
                    Zc = np.concatenate(
                        [Zc, np.zeros((Pn, dop.m_loc_max - sz_max,
                                       Zc.shape[2]), Zc.dtype)], axis=1
                    )
                self._Z_loc = self._shard(jnp.asarray(Zc[:, : dop.m_loc_max]))
                self._coarse_compact = True
            else:
                # replicated store: each device holds its partition's rows
                # of the full [N, nc] basis
                Zl = np.zeros((Pn, dop.m_loc_max, int(coarse.size)),
                              np.asarray(coarse.Z).dtype)
                Znp = np.asarray(coarse.Z)
                for p in range(Pn):
                    off, sz = int(offs[p]), int(sizes[p])
                    Zl[p, :sz] = Znp[off : off + sz]
                self._Z_loc = self._shard(jnp.asarray(Zl))
                self._coarse_compact = False
        else:
            self._Z_loc = None

        # shard the per-device arrays over the mesh
        if self.halo is not None:
            sh = lambda a: self._shard(a)
            self.halo.send_idx = self._shard(self.halo.send_idx, axis=1)
            self.halo.recv_pos = self._shard(self.halo.recv_pos, axis=1)
            self.halo.ext_src = sh(self.halo.ext_src)
            self.halo.int_src = sh(self.halo.int_src)

    # ------------------------------------------------------------------
    def _shard(self, a, axis: int = 0):
        mesh, ax = self.dop.mesh, self.dop.axis_name
        spec = [None] * a.ndim
        spec[axis] = ax
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    def _ext_user_rows(self, tree, overlap):
        """Per subdomain: ext (interior+overlap) indices in USER numbering,
        padded to n_ext_max with repeats of the first row (masked out)."""
        offs, sizes = tree.partition_offsets_sizes()
        Pn = tree.n_partitions
        perm = tree.permutation
        n_ext_max = self.halo.n_ext_max
        rows = np.zeros((Pn, n_ext_max), np.int64)
        valid = np.zeros((Pn, n_ext_max), bool)
        for p in range(Pn):
            off, sz = int(offs[p]), int(sizes[p])
            idx = np.concatenate([np.arange(off, off + sz),
                                  np.asarray(overlap[p], np.int64)])
            rows[p, : idx.size] = perm[idx]
            valid[p, : idx.size] = True
        return rows, valid

    def _setup_dense(self, generator, tree, overlap, perm):
        rows, valid = self._ext_user_rows(tree, overlap)
        rows_j = jnp.asarray(rows, jnp.int32)
        A_loc = generator.block(rows_j, rows_j)  # [P, n_ext, n_ext]
        vm = jnp.asarray(valid)
        A_loc = jnp.where(vm[:, :, None] & vm[:, None, :], A_loc, 0)
        eye = jnp.eye(self.halo.n_ext_max, dtype=A_loc.dtype)[None]
        A_loc = A_loc + jnp.where(vm[:, :, None], 0, eye)
        from .ddm import _chunked_batch_lu

        lu, piv = _chunked_batch_lu(A_loc)
        self._lu = self._shard(lu)
        self._piv = self._shard(piv)
        self.infos["Local_size_max"] = int(self.halo.n_ext_max)

    def _setup_blr(self, generator, tree, overlap, perm, blr_epsilon,
                   blr_block_size):
        from ..clustering.cluster_tree import ClusterTreeBuilder
        from ..generator import SubsetGenerator
        from ..hmatrix.blr import blr_lu, build_blr

        offs, sizes = tree.partition_offsets_sizes()
        Pn = tree.n_partitions
        factors = []
        for p in range(Pn):
            off, sz = int(offs[p]), int(sizes[p])
            idx = np.concatenate([np.arange(off, off + sz),
                                  np.asarray(overlap[p], np.int64)])
            sub_user = perm[idx]
            sub_pts = tree.points[sub_user]
            sub_tree = ClusterTreeBuilder(
                max_leaf_size=min(blr_block_size, max(32, idx.size // 8))
            ).build(sub_pts)
            sub_gen = SubsetGenerator(generator, sub_user)
            B = build_blr(sub_gen, sub_tree, epsilon=blr_epsilon,
                          block_size=blr_block_size)
            factors.append(blr_lu(B))
        sf = _stack_blr_factors(factors, self.halo.n_ext_max)
        # shard every [P, ...] leaf
        sf.D = self._shard(sf.D)
        sf.U = self._shard(sf.U)
        sf.V = self._shard(sf.V)
        sf.piv = self._shard(sf.piv)
        sf.pad_idx = self._shard(sf.pad_idx)
        sf.mask = self._shard(sf.mask)
        sf.cells2ext = self._shard(sf.cells2ext)
        sf.fwd = tuple(self._shard(a) for a in sf.fwd)
        sf.bwd = tuple(self._shard(a) for a in sf.bwd)
        self._sf = sf
        self.infos["Local_size_max"] = int(self.halo.n_ext_max)
        self.infos["BLR_cells"] = int(sf.nL)

    # ------------------------------------------------------------------
    def solve(
        self,
        b,
        tol: float = 1e-6,
        maxiter: int = 200,
        krylov: str = "gmres",
        restart: int = 40,
    ):
        """Solve A x = b in USER numbering; returns (x, infos).  The Krylov
        loop, preconditioner, and halo exchange all run inside one
        shard_map over the operator's mesh."""
        d = self.dop
        mesh, ax = d.mesh, d.axis_name
        halo = self.halo
        from ..utils.cxfer import to_device

        b = to_device(b)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        k = b.shape[1]
        perm = jnp.asarray(self.tree.permutation, jnp.int32)
        bc = b[perm]
        dtype = jnp.result_type(d.dtype, b.dtype)
        b_loc = d.to_local_layout(bc).astype(dtype)  # [P*m_loc_max, k]

        dense_bs, lr_bs = d.dense_buckets, d.lr_buckets
        bucket_specs_dense = [
            DenseBucket(P(ax), P(ax), P(ax), P(ax), P(ax), bkt.mirror)
            for bkt in dense_bs
        ]
        bucket_specs_lr = [
            LowRankBucket(P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), bkt.mirror)
            for bkt in lr_bs
        ]
        compact_idx = d._compact_idx
        mode = self._mode
        variant = self.schwarz
        coarse = self.coarse
        correction = self.coarse_correction
        sf = getattr(self, "_sf", None)

        # gather sharded per-device operands for in_specs
        precond_args = ()
        precond_specs = ()
        if halo is not None:
            halo_args = (halo.send_idx, halo.recv_pos, halo.ext_src, halo.int_src)
            halo_specs = (P(None, ax), P(None, ax), P(ax), P(ax))
            if mode == "dense":
                precond_args = (self._lu, self._piv)
                precond_specs = (P(ax), P(ax))
            else:
                precond_args = (sf.D, sf.U, sf.V, sf.piv, sf.pad_idx, sf.mask,
                                sf.cells2ext) + sf.fwd + sf.bwd
                precond_specs = tuple(P(ax) for _ in precond_args)
        else:
            halo_args, halo_specs = (), ()
        coarse_args = (self._Z_loc,) if coarse is not None else ()
        coarse_specs = (P(ax),) if coarse is not None else ()

        def local_solve(dense_sl, lr_sl, b_sl, t_root, halo_sl, pre_sl, coarse_sl):
            dense_sl = [jax.tree.map(lambda a: a[0], bkt) for bkt in dense_sl]
            lr_sl = [jax.tree.map(lambda a: a[0], bkt) for bkt in lr_sl]
            h = d._local_hmatrix(dense_sl, lr_sl, t_root[0])

            def A_apply(x_sl):
                x_all = jax.lax.all_gather(x_sl, ax).reshape(-1, k)
                return _local_matvec(h, x_all[compact_idx], op="N")

            M = None
            if halo is not None:
                send_idx, recv_pos, ext_src, int_src = (
                    halo_sl[0][:, 0], halo_sl[1][:, 0], halo_sl[2][0], halo_sl[3][0],
                )

                def M1(r_sl):
                    r_ext = _halo_gather(halo, ax, r_sl, send_idx, recv_pos, ext_src)
                    if mode == "dense":
                        lu_p, piv_p = pre_sl[0][0], pre_sl[1][0]
                        z_ext = jax.scipy.linalg.lu_solve(
                            (lu_p.astype(r_ext.dtype), piv_p), r_ext
                        )
                    else:
                        (Dp, Up, Vp, pivp, padp, maskp, c2e), tabs = (
                            tuple(a[0] for a in pre_sl[:7]),
                            tuple(a[0] for a in pre_sl[7:]),
                        )
                        z_ext = _blr_local_solve(
                            sf, Dp, Up, Vp, pivp, padp, maskp, c2e,
                            tabs[:6], tabs[6:], r_ext,
                        )
                    z_ext_pad = jnp.concatenate(
                        [z_ext, jnp.zeros((1, k), z_ext.dtype)], axis=0
                    )
                    z_int = z_ext_pad[int_src]  # interior rows (weight 1)
                    if variant == "asm":
                        z_int = _halo_scatter_add(
                            halo, ax, z_ext, z_int, send_idx, recv_pos
                        )
                    return z_int

                if coarse is not None:
                    Zl = coarse_sl[0][0].astype(dtype)
                    if getattr(self, "_coarse_compact", False):
                        # compact sharded store: Zl [m_loc_max, nu_max];
                        # device p owns coarse slots [p*nu_max, ...) — μ is
                        # embedded at the device's slot offset and psum'd
                        # (coarse_operator_builder.hpp:18-129 distributed)
                        nu_max = coarse.nu_max
                        nc_pad = coarse.Z_loc.shape[0] * nu_max

                        def Q(r_sl):
                            mu_l = jnp.conj(Zl).T @ r_sl  # [nu_max, k]
                            off = jax.lax.axis_index(ax) * nu_max
                            zero = jnp.zeros((), off.dtype)
                            mu = jax.lax.dynamic_update_slice(
                                jnp.zeros((nc_pad, k), mu_l.dtype), mu_l,
                                (off, zero),
                            )
                            mu = jax.lax.psum(mu, ax)
                            e = jax.scipy.linalg.lu_solve(
                                (coarse.E_lu.astype(dtype), coarse.E_piv), mu
                            )
                            return Zl @ jax.lax.dynamic_slice(
                                e, (off, zero), (nu_max, k)
                            )
                    else:
                        # replicated store: Zl [m_loc_max, nc]

                        def Q(r_sl):
                            mu = jax.lax.psum(jnp.conj(Zl).T @ r_sl, ax)
                            e = jax.scipy.linalg.lu_solve(
                                (coarse.E_lu.astype(dtype), coarse.E_piv), mu
                            )
                            return Zl @ e

                    if correction == "additive":
                        M = lambda r: M1(r) + Q(r)
                    elif correction == "deflated":
                        def M(r):
                            Qr = Q(r)
                            return Qr + M1(r - A_apply(Qr))
                    elif correction == "balanced":
                        def M(r):
                            Qr = Q(r)
                            t = M1(r - A_apply(Qr))
                            return Qr + t - Q(A_apply(t))
                    else:
                        raise ValueError(correction)
                else:
                    M = M1

            if krylov == "cg":
                res = cg(A_apply, b_sl, M=M, tol=tol, maxiter=maxiter,
                         axis_name=ax)
            elif krylov == "gmres":
                res = gmres(A_apply, b_sl, M=M, tol=tol, maxiter=maxiter,
                            restart=restart, axis_name=ax)
            elif krylov == "block_gmres":
                from .krylov import block_gmres

                res = block_gmres(A_apply, b_sl, M=M, tol=tol,
                                  maxiter=maxiter, restart=restart,
                                  axis_name=ax)
            else:
                raise ValueError(f"unknown krylov method {krylov!r}")
            return res.x, res.iterations, res.residual, res.converged

        t0 = time.perf_counter()
        x_loc, it, resid, conv = jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(
                bucket_specs_dense,
                bucket_specs_lr,
                P(ax),
                P(ax),
                halo_specs,
                precond_specs,
                coarse_specs,
            ),
            out_specs=(P(ax), P(), P(), P()),
            check_vma=False,
        )(dense_bs, lr_bs, b_loc, d._t_root, halo_args, precond_args, coarse_args)
        xc = d.to_global_layout(x_loc)
        xc.block_until_ready()
        self.infos["Solve_walltime"] = time.perf_counter() - t0
        self.infos["Krylov"] = krylov
        self.infos["Nb_it"] = int(it)
        self.infos["Residual"] = float(resid)
        self.infos["Converged"] = bool(conv)

        x = jnp.zeros_like(xc).at[perm].set(xc)
        return (x[:, 0] if squeeze else x), dict(self.infos)
