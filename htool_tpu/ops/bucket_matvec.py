"""Fused Pallas TPU kernels for the bucketed H-matrix product.

TPU-native replacement for the leaf-loop product hot path (reference
``hmatrix/linalg/add_hmatrix_vector_product.hpp:106-170``): the XLA path in
:mod:`..hmatrix.linalg` is gather -> batched einsum -> scatter-add, and the
scatter-add dominates on TPU (overlapping indices serialize).  Here each
bucket term is ONE Pallas kernel: a sequential grid over the bucket's blocks
that keeps the whole input and output vectors resident in VMEM, DMAs one
block per grid step (double-buffered by the pipeline), runs the small MXU
matmul(s), and accumulates into the output ref in place — no gather and no
scatter HLOs at all.

Layout notes:
- ``x``/``y`` are [L, k] with k padded to the 128-lane tile by the compiler;
  VMEM cost is ~L*128*4 bytes each, so the kernels are gated by a VMEM
  budget check (fallback = the XLA einsum path).
- block offsets are scalar-prefetch operands (`PrefetchScalarGridSpec`), so
  the per-step DMA source index is known before the kernel body runs.
- complex dtypes and float64 are not supported by Mosaic — callers fall back
  to the einsum path (mode 'C'/'conj' reduce to 'T'/'N' for real dtypes).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["dense_bucket_matvec", "lr_bucket_matvec", "pallas_matvec_ok"]

# lazily imported so CPU-only use of the package never touches pallas
_pl = None
_pltpu = None


def _mods():
    global _pl, _pltpu
    if _pl is None:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        _pl, _pltpu = pl, pltpu
    return _pl, _pltpu


_VMEM_BUDGET = 13 * 1024 * 1024  # leave headroom under ~16MB/core

# blocks per grid step: the grid is sequential on TPU, so per-step overhead
# (scalar loads, DMA setup) dominates once blocks are small — group G blocks
# into one step (one batched MXU dot + G VMEM scatter-adds) and size G so a
# step moves ~1MB
_GROUP_TARGET_BYTES = 1 * 1024 * 1024
_GROUP_MAX = 32


def _lanes(d: int) -> int:
    return -(-d // 128) * 128


def _step_bytes(blk_bytes: int, in_w: int, out_w: int, k: int, item: int) -> int:
    """VMEM bytes of ONE grid step at group size 1: the double-buffered block
    payload plus the gathered input stack and the contribution produced by
    the batched dot (both [·, w, lanes(k)] VMEM temporaries)."""
    return blk_bytes + (in_w + out_w) * _lanes(k) * item


def _group_factor(nb: int, blk_bytes: int, in_w: int, out_w: int, k: int,
                  item: int) -> int:
    per = _step_bytes(blk_bytes, in_w, out_w, k, item)
    g = 1
    while g < _GROUP_MAX and g * 2 * 2 * per <= 2 * _GROUP_TARGET_BYTES and g * 2 <= nb:
        g *= 2
    return g


def _vec_vmem_bytes(L: int, k: int, itemsize: int) -> int:
    return L * _lanes(k) * itemsize


def pallas_matvec_ok(dtype, out_len: int, in_len: int, k: int, blk_bytes: int,
                     in_w: int = 0, out_w: int = 0) -> bool:
    """Whether the fused resident kernels apply: TPU backend,
    Mosaic-supported real dtype, and the resident vectors + double-buffered
    group payload (block + gather/contribution scratch) fit in VMEM."""
    mode = os.environ.get("HTOOL_TPU_PALLAS", "auto")
    if mode == "0":
        return False
    backend_ok = mode == "interpret" or jax.default_backend() == "tpu"
    if not backend_ok:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return False
    item = jnp.dtype(dtype).itemsize
    # grouping packs steps up to the target, so budget the larger of one
    # step's payload and one full group
    per = _step_bytes(blk_bytes, in_w, out_w, k, item)
    need = (
        _vec_vmem_bytes(out_len, k, item)
        + _vec_vmem_bytes(in_len, k, item)
        + 2 * max(per, _GROUP_TARGET_BYTES)
    )
    return need <= _VMEM_BUDGET


def _interpret() -> bool:
    return os.environ.get("HTOOL_TPU_PALLAS", "auto") == "interpret"


# ======================================================================
# dense bucket:  y[out_off_i : out_off_i+out_w] += op(D_i) @ x[in_off_i : +in_w]
# ======================================================================


def _dense_kernel(trans: bool, bm: int, bn: int, G: int, in_off_ref, out_off_ref, d_ref, x_ref, y_ref):
    pl, _ = _mods()
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    in_w = bm if trans else bn
    out_w = bn if trans else bm
    base = i * G
    # gather the G input slices, one batched MXU dot, G scatter-adds
    xg = jnp.stack(
        [x_ref[pl.ds(in_off_ref[base + g], in_w), :] for g in range(G)]
    )  # [G, in_w, k]
    blk = d_ref[:]  # [G, bm, bn]
    cdim = 1 if trans else 2
    contrib = jax.lax.dot_general(
        blk,
        xg,
        dimension_numbers=(((cdim,), (1,)), ((0,), (0,))),
        preferred_element_type=y_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # [G, out_w, k]
    for g in range(G):
        off = out_off_ref[base + g]
        y_ref[pl.ds(off, out_w), :] = y_ref[pl.ds(off, out_w), :] + contrib[g]


def _pad_group(nb: int, G: int, *arrays):
    """Pad the leading block dim to a multiple of G with zeros (offset pads
    point at 0; zero blocks contribute nothing)."""
    pad = (-nb) % G
    if pad == 0:
        return arrays
    out = []
    for a in arrays:
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, cfg))
    return tuple(out)


@partial(jax.jit, static_argnames=("trans", "out_len"))
def dense_bucket_matvec(data, in_off, out_off, x_pad, trans: bool, out_len: int):
    """data [nb, bm, bn]; x_pad [Lx, k]; returns y [out_len, k] with
    ``y[out_off_i:...] += (D_i or D_i^T) @ x[in_off_i:...]`` summed over i."""
    pl, pltpu = _mods()
    nb, bm, bn = data.shape
    k = x_pad.shape[1]
    item = jnp.dtype(x_pad.dtype).itemsize
    in_w, out_w = (bm, bn) if trans else (bn, bm)
    G = _group_factor(nb, bm * _lanes(bn) * item, in_w, out_w, k, item)
    data, in_off, out_off = _pad_group(nb, G, data, in_off.astype(jnp.int32), out_off.astype(jnp.int32))
    nb_pad = data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_pad // G,),
        in_specs=[
            pl.BlockSpec((G, bm, bn), lambda i, io, oo: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_dense_kernel, trans, bm, bn, G),
        out_shape=jax.ShapeDtypeStruct((out_len, k), x_pad.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(in_off, out_off, data, x_pad)


# ======================================================================
# low-rank bucket:  y += op(U_i V_i) @ x_slice
# ======================================================================


def _lr_kernel(trans: bool, bm: int, bn: int, G: int, in_off_ref, out_off_ref, u_ref, v_ref, x_ref, y_ref):
    pl, _ = _mods()
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    in_w = bm if trans else bn
    out_w = bn if trans else bm
    base = i * G
    xg = jnp.stack(
        [x_ref[pl.ds(in_off_ref[base + g], in_w), :] for g in range(G)]
    )  # [G, in_w, k]
    U = u_ref[:]  # [G, bm, r]
    V = v_ref[:]  # [G, r, bn]
    hi = jax.lax.Precision.HIGHEST
    if trans:
        # (U V)^T x = V^T (U^T x), batched over the group
        t = jax.lax.dot_general(
            U, xg, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=y_ref.dtype, precision=hi,
        )  # [G, r, k]
        contrib = jax.lax.dot_general(
            V, t, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=y_ref.dtype, precision=hi,
        )  # [G, bn, k]
    else:
        t = jax.lax.dot_general(
            V, xg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=y_ref.dtype, precision=hi,
        )  # [G, r, k]
        contrib = jax.lax.dot_general(
            U, t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=y_ref.dtype, precision=hi,
        )  # [G, bm, k]
    for g in range(G):
        off = out_off_ref[base + g]
        y_ref[pl.ds(off, out_w), :] = y_ref[pl.ds(off, out_w), :] + contrib[g]


@partial(jax.jit, static_argnames=("trans", "out_len"))
def lr_bucket_matvec(U, V, in_off, out_off, x_pad, trans: bool, out_len: int):
    """U [nb, bm, r], V [nb, r, bn]; accumulates op(U_i V_i) @ x slices."""
    pl, pltpu = _mods()
    nb, bm, r = U.shape
    bn = V.shape[2]
    k = x_pad.shape[1]
    item = jnp.dtype(x_pad.dtype).itemsize
    in_w, out_w = (bm, bn) if trans else (bn, bm)
    G = _group_factor(nb, (bm * _lanes(r) + r * _lanes(bn)) * item,
                      in_w, out_w, k, item)
    U, V, in_off, out_off = _pad_group(
        nb, G, U, V, in_off.astype(jnp.int32), out_off.astype(jnp.int32)
    )
    nb_pad = U.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_pad // G,),
        in_specs=[
            pl.BlockSpec((G, bm, r), lambda i, io, oo: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, r, bn), lambda i, io, oo: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_lr_kernel, trans, bm, bn, G),
        out_shape=jax.ShapeDtypeStruct((out_len, k), x_pad.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(in_off, out_off, U, V, x_pad)
