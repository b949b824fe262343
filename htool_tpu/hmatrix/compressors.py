"""Additional low-rank compressors: full-pivot ACA, truncated SVD, and
batched SVD recompression.

References:
- fullACA (``hmatrix/lrmat/fullACA.hpp:16-89``): assemble the block, then
  full-pivot ACA with the exact Frobenius residual as stopping rule.
- SVD compressor (``hmatrix/lrmat/SVD.hpp:15-93``): truncated SVD with the
  trailing-energy criterion of ``SVD_truncation``
  (``matrix/utils/SVD_truncation.hpp:14-55``): smallest k with
  ‖σ_{k+1:}‖/‖σ‖ < ε.
- SVD recompression (``hmatrix/lrmat/utils/SVD_recompression.hpp:18-181``):
  QR(U)·LQ(V) -> small SVD of R·Lᵀ -> re-expand; here batched QR + SVD on
  stacked blocks (one device kernel per bucket).

All routines are batched over a leading block axis and masked for padding,
like :mod:`.aca`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from ..utils.precision import precise_jit

__all__ = [
    "batched_full_aca",
    "batched_svd_compress",
    "batched_recompress",
    "svd_truncation_rank",
]


def _masks(nb, m, n, t_sizes, s_sizes):
    row = jnp.arange(m)[None, :] < t_sizes[:, None]
    col = jnp.arange(n)[None, :] < s_sizes[:, None]
    return row, col


@partial(precise_jit, static_argnames=("rmax", "reqrank"))
def batched_full_aca(gen, rows, cols, t_sizes, s_sizes, epsilon, rmax, reqrank=-1):
    """Full-pivot ACA on assembled blocks (fullACA.hpp:16-89).

    Returns (U [nb,m,rmax], V [nb,rmax,n], rank, failed).  The residual is
    tracked exactly: R_{k+1} = R_k − u vᵀ, pivot = global argmax |R|."""
    nb, m = rows.shape
    n = cols.shape[1]
    dtype = gen.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    row_mask, col_mask = _masks(nb, m, n, t_sizes, s_sizes)
    vm = row_mask[:, :, None] & col_mask[:, None, :]

    A = jnp.where(vm, gen.block(rows, cols), 0)
    norm0 = jnp.sqrt(jnp.sum(jnp.abs(A) ** 2, axis=(1, 2)))
    eps = jnp.asarray(epsilon, rdtype)

    U0 = jnp.zeros((nb, m, rmax), dtype)
    V0 = jnp.zeros((nb, rmax, n), dtype)
    barange = jnp.arange(nb)

    def cond(st):
        active, k = st[4], st[5]
        return (k < rmax) & jnp.any(active)

    def body(st):
        R, U, V, q, active, k, _failed = st
        # advantage bound, as in partial ACA (partialACA.hpp:84)
        if reqrank < 0:
            not_adv = (k + 1) * (t_sizes + s_sizes) > t_sizes * s_sizes
        else:
            not_adv = jnp.zeros((nb,), bool)
        failed_now = active & not_adv
        active2 = active & ~not_adv

        absR = jnp.abs(R).reshape(nb, -1)
        flat = jnp.argmax(absR, axis=1)
        I = (flat // n).astype(jnp.int32)
        J = (flat % n).astype(jnp.int32)
        pivot = R[barange, I, J]
        zero = jnp.abs(pivot) <= 1e-15
        active3 = active2 & ~zero

        u = R[barange, :, J]  # [nb, m]
        v = R[barange, I, :] / jnp.where(zero, 1, pivot)[:, None]  # [nb, n]
        Rnew = R - u[:, :, None] * v[:, None, :]

        upd = active3
        R = jnp.where(upd[:, None, None], Rnew, R)
        # slice-local select (a full-array where would copy U/V every
        # iteration; see the same fix in aca.py)
        U = U.at[:, :, k].set(jnp.where(upd[:, None], u, U[:, :, k]))
        V = V.at[:, k, :].set(jnp.where(upd[:, None], v, V[:, k, :]))
        q = jnp.where(upd, k + 1, q)

        resnorm = jnp.sqrt(jnp.sum(jnp.abs(R) ** 2, axis=(1, 2)))
        if reqrank < 0:
            converged = upd & (resnorm <= eps * jnp.maximum(norm0, 1e-300))
        else:
            limit = jnp.minimum(
                jnp.asarray(reqrank, jnp.int32),
                jnp.minimum(t_sizes, s_sizes).astype(jnp.int32),
            )
            converged = upd & (q >= limit)
        active4 = active3 & ~converged
        return (R, U, V, q, active4, k + 1, st[6] | failed_now | (active2 & zero & (q == 0)))

    R, U, V, q, active, _, failed = jax.lax.while_loop(
        cond,
        body,
        (
            A,
            U0,
            V0,
            jnp.zeros((nb,), jnp.int32),
            jnp.ones((nb,), bool),
            jnp.zeros((), jnp.int32),
            jnp.zeros((nb,), bool),
        ),
    )
    failed = failed | (active if reqrank < 0 else jnp.zeros((nb,), bool))
    rank = jnp.where(failed, 0, q)
    return U, V, rank, failed


def svd_truncation_rank(s, epsilon):
    """Rank by trailing-energy criterion (SVD_truncation.hpp:14-55):
    smallest k with ‖σ_{k+1:}‖ ≤ ε·‖σ‖.  s: [nb, p] descending."""
    tail = jnp.sqrt(
        jnp.cumsum(s[:, ::-1] ** 2, axis=1)[:, ::-1]
    )  # tail[k] = ||s[k:]||
    total = tail[:, :1]
    keep = tail > epsilon * jnp.maximum(total, 1e-300)
    # rank = number of leading singular values NOT coverable by the tail bound
    return jnp.sum(keep, axis=1).astype(jnp.int32)


@partial(precise_jit, static_argnames=("rmax", "reqrank"))
def batched_svd_compress(gen, rows, cols, t_sizes, s_sizes, epsilon, rmax, reqrank=-1):
    """Truncated-SVD compressor (SVD.hpp:15-93): assemble, SVD, keep the
    epsilon-rank (or reqrank).  Returns (U, V, rank, failed)."""
    nb, m = rows.shape
    n = cols.shape[1]
    dtype = gen.dtype
    row_mask, col_mask = _masks(nb, m, n, t_sizes, s_sizes)
    vm = row_mask[:, :, None] & col_mask[:, None, :]
    A = jnp.where(vm, gen.block(rows, cols), 0)

    Uf, s, Vh = jnp.linalg.svd(A, full_matrices=False)  # [nb,m,p],[nb,p],[nb,p,n]
    if reqrank < 0:
        rank = svd_truncation_rank(s, epsilon)
    else:
        rank = jnp.minimum(
            jnp.asarray(reqrank, jnp.int32),
            jnp.minimum(t_sizes, s_sizes).astype(jnp.int32),
        ) * jnp.ones((nb,), jnp.int32)
    # not advantageous -> dense (SVD.hpp:40)
    failed = rank * (t_sizes + s_sizes) > t_sizes * s_sizes
    if reqrank >= 0:
        failed = jnp.zeros((nb,), bool)
    rank = jnp.where(failed, 0, rank)

    p = s.shape[1]
    keep = jnp.arange(p)[None, :] < rank[:, None]
    sv = jnp.where(keep, s, 0)
    U = (Uf * sv[:, None, :].astype(dtype))[:, :, :rmax]
    V = Vh[:, :rmax, :]
    # zero truncated columns
    keep_r = (jnp.arange(min(p, rmax))[None, :] < rank[:, None])
    U = U * keep_r[:, None, :].astype(dtype)
    V = V * keep_r[:, :, None].astype(dtype)
    if rmax > p:
        U = jnp.pad(U, ((0, 0), (0, 0), (0, rmax - p)))
        V = jnp.pad(V, ((0, 0), (0, rmax - p), (0, 0)))
    return U, V, rank, failed


@precise_jit
def batched_recompress(U, V, ranks, epsilon):
    """SVD recompression of stacked LR factors
    (SVD_recompression.hpp:18-181): QR(U), LQ(V), SVD of R_U·R_Vᵀ, truncate
    at epsilon, re-expand.  ``ranks`` masks the valid columns of each block.

    Returns (U2, V2, new_ranks) with the same padded rank width."""
    nb, m, r = U.shape
    n = V.shape[2]
    keep = jnp.arange(r)[None, :] < ranks[:, None]
    U = U * keep[:, None, :].astype(U.dtype)
    V = V * keep[:, :, None].astype(V.dtype)

    Qu, Ru = jnp.linalg.qr(U)  # [nb,m,k1], [nb,k1,r], k1 = min(m,r)
    Qv, Rv = jnp.linalg.qr(jnp.swapaxes(jnp.conj(V), 1, 2))  # [nb,n,k2], [nb,k2,r]
    M = Ru @ jnp.swapaxes(jnp.conj(Rv), 1, 2)  # [nb,k1,k2]
    Um, s, Vh = jnp.linalg.svd(M, full_matrices=False)  # q = min(k1,k2)
    q = s.shape[1]
    new_rank = jnp.minimum(svd_truncation_rank(s, epsilon), ranks)
    keep2 = jnp.arange(q)[None, :] < new_rank[:, None]
    sv = jnp.where(keep2, s, 0)
    U2 = Qu @ (Um * sv[:, None, :].astype(U.dtype))  # [nb,m,q]
    V2 = Vh @ jnp.swapaxes(jnp.conj(Qv), 1, 2)  # [nb,q,n]
    U2 = U2 * keep2[:, None, :].astype(U.dtype)
    V2 = V2 * keep2[:, :, None].astype(V.dtype)
    if q < r:
        U2 = jnp.pad(U2, ((0, 0), (0, 0), (0, r - q)))
        V2 = jnp.pad(V2, ((0, 0), (0, r - q), (0, 0)))
    return U2, V2, new_rank
