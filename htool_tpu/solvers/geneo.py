"""GenEO two-level coarse space.

Mirrors the reference's GenEO builders (``solvers/geneo/coarse_space_builder.
hpp:15-185`` and ``coarse_operator_builder.hpp:18-144``):

- per subdomain, solve the generalized EVP ``(D Aᵢ D) v = λ Bᵢ v`` where D is
  the 1/0 interior partition of unity (DAiD = Aᵢ with only the interior block
  kept, coarse_space_builder.hpp:28-37), Bᵢ a user-supplied local matrix
  (Neumann matrix in the BEM/FEM setting; defaults to Aᵢ);
- select the ν eigenvectors of largest |λ| (or all with |λ| > threshold)
  (coarse_space_builder.hpp:102-107);
- coarse basis Z keeps only interior rows (Z = D·v, :127-133);
- coarse operator E = Z* A Z assembled with global products
  (coarse_operator_builder.hpp:80-128) and dense-factorized.

Two-level corrections (HPDDM ``-hpddm_schwarz_coarse_correction``):
additive, deflated, balanced.

The EVPs are setup-time and run on host (scipy); E and the correction apply
on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..clustering.cluster_tree import ClusterTree
from ..generator import Generator
from ..utils.precision import precise_jit

__all__ = ["GeneoCoarseSpace", "build_geneo_coarse_space"]


@dataclass
class GeneoCoarseSpace:
    Z: Any  # [N, nc] global coarse basis, cluster numbering
    E_lu: Any
    E_piv: Any
    size: int
    nu_per_subdomain: np.ndarray = None
    eigenvalues: list = None

    def coarse_solve(self, r):
        """Q r = Z E⁻¹ Z* r for r [N, k]."""
        rhs = jnp.conj(self.Z).T @ r
        c = jax.scipy.linalg.lu_solve((self.E_lu, self.E_piv), rhs)
        return self.Z @ c

    def combined_preconditioner(
        self,
        one_level: Optional[Callable],
        A_apply: Callable,
        correction: str = "additive",
    ) -> Callable:
        M1 = one_level if one_level is not None else (lambda v: v)
        Q = self.coarse_solve

        if correction == "additive":

            def M(r):
                return M1(r) + Q(r)

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
            raise ValueError(f"unknown coarse correction {correction!r}")

        return M


@precise_jit
def _k_geneo_eigh(DAiD, Bi):
    """Batched hermitian-definite generalized EVP over padded subdomains:
    Cholesky-transform Bᵢ = Lᵢ Lᵢ^H, solve the standard EVP on
    Cᵢ = Lᵢ⁻¹ (D Aᵢ D) Lᵢ⁻ᴴ with one batched ``eigh``, and back-transform
    vᵢ = Lᵢ⁻ᴴ yᵢ — the sygv/hegv reduction (coarse_space_builder.hpp:89-92)
    executed as three batched device kernels (SURVEY.md §7.1)."""
    L = jnp.linalg.cholesky(Bi)

    def one(L_p, M_p):
        C1 = jax.scipy.linalg.solve_triangular(L_p, M_p, lower=True)
        C = jnp.conj(
            jax.scipy.linalg.solve_triangular(L_p, jnp.conj(C1).T, lower=True)
        ).T
        C = 0.5 * (C + jnp.conj(C).T)
        w, y = jnp.linalg.eigh(C)
        v = jax.scipy.linalg.solve_triangular(L_p, y, lower=True, trans=2)
        return w, v

    return jax.vmap(one)(L, DAiD)


def build_geneo_coarse_space(
    generator: Generator,
    tree: ClusterTree,
    overlap: list[np.ndarray],
    A_apply: Callable,
    nu: int = 2,
    threshold: float = -1.0,
    local_B: Optional[list[np.ndarray]] = None,
    symmetry: str = "S",
    infos: Optional[dict] = None,
) -> GeneoCoarseSpace:
    """Build the GenEO coarse space.

    ``overlap``: per-partition overlap-only index sets (cluster numbering),
    as produced by :func:`~htool_tpu.solvers.ddm.build_geometric_overlap`.
    ``A_apply``: global operator on cluster-numbered [N, k] arrays (used for
    E = Z* A Z).  ``local_B[p]``: the Bᵢ matrix over [interior; overlap]
    DOFs; defaults to Aᵢ itself.

    Symmetric/hermitian problems run ONE batched device EVP over all padded
    subdomains (:func:`_k_geneo_eigh`); the general path falls back to host
    scipy ``eig`` per subdomain (``ggev``, coarse_space_builder.hpp:142-145).
    ``infos`` (optional dict) receives the reference's GenEO timing entries
    (ddm.hpp:232-324)."""
    offs, sizes = tree.partition_offsets_sizes()
    P = tree.n_partitions
    N = tree.n_points
    perm = tree.permutation

    t0 = time.perf_counter()
    sub_idx = []
    for p in range(P):
        off, sz = int(offs[p]), int(sizes[p])
        sub_idx.append(
            np.concatenate([np.arange(off, off + sz), np.asarray(overlap[p], np.int64)])
        )
    n_max = max(i.size for i in sub_idx)

    Z_cols = []
    nus = []
    eigs = []
    if symmetry in ("S", "H"):
        # ---- batched device path ----
        rows = np.zeros((P, n_max), np.int64)
        valid = np.zeros((P, n_max), bool)
        for p, idx in enumerate(sub_idx):
            rows[p, : idx.size] = perm[idx]
            valid[p, : idx.size] = True
        Ai = generator.block(jnp.asarray(rows, jnp.int32), jnp.asarray(rows, jnp.int32))
        vm = jnp.asarray(valid)
        pair = vm[:, :, None] & vm[:, None, :]
        Ai = jnp.where(pair, Ai, 0)
        if local_B is not None:
            Bi = np.zeros((P, n_max, n_max), np.asarray(local_B[0]).dtype)
            for p, Bp in enumerate(local_B):
                Bp = np.asarray(Bp)
                Bi[p, : Bp.shape[0], : Bp.shape[1]] = Bp
            Bi = jnp.asarray(Bi)
            Bi = jnp.where(pair, Bi, 0)
        else:
            Bi = Ai
        # identity on padding keeps Bᵢ positive definite
        eye = jnp.eye(n_max, dtype=Ai.dtype)[None]
        Bi = Bi + jnp.where(vm[:, :, None], 0, eye)
        # DAiD: interior block only (coarse_space_builder.hpp:28-37)
        int_mask = jnp.asarray(
            np.arange(n_max)[None, :] < sizes[:, None]
        )
        dpair = int_mask[:, :, None] & int_mask[:, None, :]
        DAiD = jnp.where(dpair, Ai, 0)
        w_all, v_all = _k_geneo_eigh(DAiD, Bi)
        w_all = np.asarray(w_all)  # [P, n_max] ascending
        v_all = np.asarray(v_all)
        for p in range(P):
            n_i = sub_idx[p].size
            sz = int(sizes[p])
            w = w_all[p]
            order = np.argsort(-np.abs(w))
            if threshold > 0:
                nevi = int(np.sum(np.abs(w) > threshold))
            else:
                nevi = min(nu, n_i)
            sel = order[:nevi]
            eigs.append(np.abs(w[sel]))
            nus.append(nevi)
            for j in sel:
                col = np.zeros(N, v_all.dtype)
                col[np.arange(int(offs[p]), int(offs[p]) + sz)] = v_all[p, :sz, j]
                Z_cols.append(col)
    else:
        # ---- general (non-hermitian) host path ----
        import scipy.linalg as sla

        for p in range(P):
            idx = sub_idx[p]
            sz = int(sizes[p])
            rows_user = perm[idx]
            Ai = np.asarray(generator.block(rows_user, rows_user))
            DAiD = np.zeros_like(Ai)
            DAiD[:sz, :sz] = Ai[:sz, :sz]
            Bi = np.asarray(local_B[p]) if local_B is not None else Ai
            w, v = sla.eig(DAiD, Bi)
            order = np.argsort(-np.abs(w))
            if threshold > 0:
                nevi = int(np.sum(np.abs(w) > threshold))
            else:
                nevi = min(nu, idx.size)
            sel = order[:nevi]
            eigs.append(np.abs(w[sel]))
            nus.append(nevi)
            for j in sel:
                col = np.zeros(N, Ai.dtype)
                col[np.arange(int(offs[p]), int(offs[p]) + sz)] = v[:sz, j]
                Z_cols.append(col)

    t_evp = time.perf_counter() - t0
    Z = jnp.asarray(np.stack(Z_cols, axis=1)) if Z_cols else jnp.zeros((N, 0))
    nc = Z.shape[1]

    # E = Z* A Z via global products (coarse_operator_builder.hpp:80-128)
    t1 = time.perf_counter()
    AZ = A_apply(Z)
    E = jnp.conj(Z).T @ AZ
    t_ztaz = time.perf_counter() - t1
    t2 = time.perf_counter()
    E_lu, E_piv = jax.scipy.linalg.lu_factor(E)
    E_lu.block_until_ready()
    t_facto = time.perf_counter() - t2

    cs = GeneoCoarseSpace(
        Z=Z,
        E_lu=E_lu,
        E_piv=E_piv,
        size=int(nc),
        nu_per_subdomain=np.array(nus),
        eigenvalues=eigs,
    )
    cs.build_walltime = time.perf_counter() - t0
    if infos is not None:
        # the reference's GenEO timing infos (ddm.hpp:232-324)
        infos["GenEO_coarse_space_size"] = int(nc)
        infos["GenEO_geev_walltime"] = t_evp
        infos["GenEO_ZtAZ_walltime"] = t_ztaz
        infos["GenEO_facto_coarse_operator_walltime"] = t_facto
    return cs
