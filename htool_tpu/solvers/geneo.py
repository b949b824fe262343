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


def build_geneo_coarse_space(
    generator: Generator,
    tree: ClusterTree,
    overlap: list[np.ndarray],
    A_apply: Callable,
    nu: int = 2,
    threshold: float = -1.0,
    local_B: Optional[list[np.ndarray]] = None,
    symmetry: str = "S",
) -> GeneoCoarseSpace:
    """Build the GenEO coarse space.

    ``overlap``: per-partition overlap-only index sets (cluster numbering),
    as produced by :func:`~htool_tpu.solvers.ddm.build_geometric_overlap`.
    ``A_apply``: global operator on cluster-numbered [N, k] arrays (used for
    E = Z* A Z).  ``local_B[p]``: the Bᵢ matrix over [interior; overlap]
    DOFs; defaults to Aᵢ itself.
    """
    import scipy.linalg as sla

    offs, sizes = tree.partition_offsets_sizes()
    P = tree.n_partitions
    N = tree.n_points
    perm = tree.permutation

    t0 = time.perf_counter()
    Z_cols = []
    nus = []
    eigs = []
    for p in range(P):
        off, sz = int(offs[p]), int(sizes[p])
        interior = np.arange(off, off + sz)
        ov = np.asarray(overlap[p], np.int64)
        idx = np.concatenate([interior, ov])
        n_i = idx.size

        rows_user = perm[idx]
        Ai = np.asarray(generator.block(rows_user, rows_user))
        # DAiD: keep only the interior block (coarse_space_builder.hpp:28-37)
        DAiD = np.zeros_like(Ai)
        DAiD[: interior.size, : interior.size] = Ai[: interior.size, : interior.size]
        Bi = np.asarray(local_B[p]) if local_B is not None else Ai

        if symmetry in ("S", "H"):
            w, v = sla.eigh(DAiD, Bi)
        else:
            w, v = sla.eig(DAiD, Bi)
        order = np.argsort(-np.abs(w))
        if threshold > 0:
            nevi = int(np.sum(np.abs(w) > threshold))
        else:
            nevi = min(nu, n_i)
        sel = order[:nevi]
        eigs.append(np.abs(w[sel]))
        nus.append(nevi)

        # Z = D v: interior rows only (coarse_space_builder.hpp:127-133)
        for j in sel:
            col = np.zeros(N, Ai.dtype)
            col[interior] = v[: interior.size, j]
            Z_cols.append(col)

    Z = jnp.asarray(np.stack(Z_cols, axis=1)) if Z_cols else jnp.zeros((N, 0))
    nc = Z.shape[1]

    # E = Z* A Z via global products (coarse_operator_builder.hpp:80-128)
    AZ = A_apply(Z)
    E = jnp.conj(Z).T @ AZ
    E_lu, E_piv = jax.scipy.linalg.lu_factor(E)

    cs = GeneoCoarseSpace(
        Z=Z,
        E_lu=E_lu,
        E_piv=E_piv,
        size=int(nc),
        nu_per_subdomain=np.array(nus),
        eigenvalues=eigs,
    )
    cs.build_walltime = time.perf_counter() - t0
    return cs
