"""Tiled fused Pallas matvec for BASELINE-scale vectors (n = 100k-1M).

The resident kernels in :mod:`.bucket_matvec` keep both full vectors in
VMEM and die past ~12k rows.  Here the output vector is TILED: blocks are
sorted by output offset (host plan), packed into output tiles of T rows,
and the kernel's grid walks the blocks tile by tile — the output tile stays
VMEM-resident across its steps while the input slices are streamed from
HBM through ``pl.Element``-indexed pipelined windows (one per group lane).
Each tile's buffer carries an extension zone of E rows so blocks straddling
the tile boundary accumulate locally; a cheap XLA fold
(``y[t·T : t·T+T+E] += tile_t``) produces the final vector.

This is the hot-path role of the reference's OpenMP leaf-loop product
(``hmatrix/linalg/add_hmatrix_vector_product.hpp:106-170``) at the scales
BASELINE.md targets (100k one-level DDM, 1M GenEO), where the XLA
gather/scatter path pays ~3x HBM traffic and serialized scatter-adds.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .bucket_matvec import _VMEM_BUDGET, _interpret, _lanes

__all__ = [
    "TilePlan",
    "build_tile_plan",
    "build_tile_plan_complex",
    "apply_complex_plans",
    "complex_plans_ok",
    "tiled_bucket_matvec",
    "tiled_matvec_ok",
]

_TILE_ROWS = 2048  # output tile height (rows); VMEM cost 2*(T+E)*lanes(k)*item
_GROUP_MAX = 32  # Element-indexed x windows per step (one BlockSpec each)


@dataclass
class TilePlan:
    """Host-planned, device-resident schedule for one bucket orientation.

    ``data``/``U``/``V`` are the bucket blocks re-sorted by output offset and
    padded per tile to whole groups with one appended zero block.  All
    leaves are plain arrays so the plan rides through jit as a pytree.
    """

    # aux (static)
    kind: str  # "dense" | "lr"
    T: int  # tile rows
    E: int  # extension rows (= out_w)
    G: int  # blocks per grid step
    n_steps: int
    n_tiles: int
    out_len: int
    in_w: int
    out_w: int
    trans: bool  # apply blocks transposed
    # leaves
    data: Any = None  # [n_steps*G, bm, bn] sorted+padded (dense)
    U: Any = None  # [n_steps*G, r, bm] (lr) — stored TRANSPOSED: the rank
    #   dim sits on sublanes (pad to 8), not lanes (pad to 128); storing
    #   [nb, bm, r] at r=8..16 wastes 8-16x HBM in the T(8,128) layout
    V: Any = None  # [n_steps*G, r, bn]
    in_off: Any = None  # [n_steps*G] int32
    out_rel: Any = None  # [n_steps*G] int32 (tile-relative output offsets)
    tile_of: Any = None  # [n_steps] int32
    first_of: Any = None  # [n_steps] int32 (1 = first step of its tile)


def _flatten_plan(p: TilePlan):
    leaves = (p.data, p.U, p.V, p.in_off, p.out_rel, p.tile_of, p.first_of)
    aux = (p.kind, p.T, p.E, p.G, p.n_steps, p.n_tiles, p.out_len, p.in_w,
           p.out_w, p.trans)
    return leaves, aux


def _unflatten_plan(aux, leaves):
    data, U, V, in_off, out_rel, tile_of, first_of = leaves
    kind, T, E, G, n_steps, n_tiles, out_len, in_w, out_w, trans = aux
    return TilePlan(kind, T, E, G, n_steps, n_tiles, out_len, in_w, out_w,
                    trans, data, U, V, in_off, out_rel, tile_of, first_of)


jax.tree_util.register_pytree_node(TilePlan, _flatten_plan, _unflatten_plan)


def build_tile_plan(bucket, out_side: str, out_len: int,
                    tile_rows: int = _TILE_ROWS) -> TilePlan:
    """Sort the bucket's blocks by their ``out_side`` offsets, pack them into
    output tiles of ``tile_rows`` rows (each padded to whole groups with the
    zero block), and materialize the re-sorted block arrays.

    Must run OUTSIDE jit (host planning over concrete offsets)."""
    is_dense = getattr(bucket, "data", None) is not None
    bm, bn = bucket.block_shape
    out_w = bm if out_side == "t" else bn
    in_w = bn if out_side == "t" else bm
    trans = out_side == "s"
    t_off = np.asarray(bucket.t_off, np.int64)
    s_off = np.asarray(bucket.s_off, np.int64)
    out_off = t_off if out_side == "t" else s_off
    in_off = s_off if out_side == "t" else t_off
    nb = out_off.shape[0]

    # never allocate a tile buffer larger than the output itself
    T = 256
    while T < min(int(tile_rows), out_len):
        T *= 2
    n_tiles = max(1, -(-out_len // T))
    item = jnp.dtype(bucket.data.dtype if is_dense else bucket.U.dtype).itemsize
    if is_dense:
        blk_bytes = bm * _lanes(bn) * item
    else:
        r = bucket.rank_padded
        r8 = -(-r // 8) * 8
        blk_bytes = (r8 * _lanes(bm) + r8 * _lanes(bn)) * item
    per = blk_bytes + (in_w + out_w) * 128 * item
    # grid-step fixed cost dominates small steps: size the group from the
    # REMAINING VMEM after the double-buffered tile, not a fixed target
    tile_bytes = (T + out_w) * 128 * item
    avail = max(_VMEM_BUDGET - 2 * tile_bytes, 2 * per)
    G = 1
    while G < _GROUP_MAX and 2 * (G * 2) * per <= avail:
        G *= 2

    order = np.argsort(out_off, kind="stable")
    tile_id = np.minimum(out_off[order] // T, n_tiles - 1)

    # pack per tile: indices into the sorted order, padded to whole groups
    # with the zero block (index nb); every tile gets >= 1 group so its
    # output buffer is always zero-initialized
    slots: list[int] = []
    tiles: list[int] = []
    firsts: list[int] = []
    for t in range(n_tiles):
        sel = order[tile_id == t]
        cnt = max(1, len(sel))
        n_grp = -(-cnt // G)
        padded = np.full(n_grp * G, nb, np.int64)
        padded[: len(sel)] = sel
        slots.extend(padded.tolist())
        tiles.extend([t] * n_grp)
        firsts.extend([1] + [0] * (n_grp - 1))
    slots = np.asarray(slots, np.int64)
    n_steps = len(tiles)

    in_off_p = np.concatenate([in_off, [0]])[slots].astype(np.int32)
    out_rel_full = np.concatenate([out_off, [0]])[slots].astype(np.int64)
    tile_of_blk = np.repeat(np.asarray(tiles, np.int64), G)
    out_rel = (out_rel_full - tile_of_blk * T).astype(np.int32)
    out_rel[slots == nb] = 0  # zero blocks write zeros at the tile start

    gather = jnp.asarray(np.minimum(slots, nb - 1) if nb else slots, jnp.int32)
    zero_mask = jnp.asarray((slots == nb)[:, None, None])
    kw = dict(
        T=T, E=out_w, G=G, n_steps=n_steps, n_tiles=n_tiles, out_len=out_len,
        in_w=in_w, out_w=out_w, trans=trans,
        in_off=jnp.asarray(in_off_p),
        out_rel=jnp.asarray(out_rel),
        tile_of=jnp.asarray(np.asarray(tiles, np.int32)),
        first_of=jnp.asarray(np.asarray(firsts, np.int32)),
    )
    if is_dense:
        data = _row_major(jnp.where(zero_mask, 0, bucket.data[gather]))
        return TilePlan(kind="dense", data=data, **kw)
    # U stored transposed [nb, r, bm]: rank on sublanes, not lanes (8x
    # HBM-padding avoidance at the typical r = 8..16)
    U = _row_major(jnp.where(zero_mask, 0, jnp.swapaxes(bucket.U, 1, 2)[gather]))
    V = _row_major(jnp.where(zero_mask, 0, bucket.V[gather]))
    return TilePlan(kind="lr", U=U, V=V, **kw)


def _row_major(x):
    """Force canonical row-major device storage for a plan array."""
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        want = tuple(range(x.ndim))
        if x.format.layout.major_to_minor != want:
            dev = list(x.devices())[0]
            return jax.device_put(
                x, Format(Layout(major_to_minor=want), SingleDeviceSharding(dev))
            )
    except Exception:
        pass
    return x


def _pin_row_major(x):
    """Layout constraint at the consumption point: without it XLA's auto
    layout assignment picks a block-index-minor parameter layout for the
    plan arrays and inserts a full relayout copy before every pallas call
    (traced: 4.8 ms of a 25.7 ms matvec at n=100k — the stored arrays are
    already row-major)."""
    if _os.environ.get("HTOOL_TPU_PIN_LAYOUT", "1") == "0":
        return x
    try:
        from jax.experimental.layout import Format, Layout, with_layout_constraint

        return with_layout_constraint(
            x, Format(Layout(major_to_minor=tuple(range(x.ndim))))
        )
    except Exception:
        return x


def build_tile_plan_lr_split(bucket, out_side: str, out_len: int,
                             tile_rows: int = _TILE_ROWS):
    """Two chained dense-style tile plans for a WIDE low-rank bucket whose
    one-shot plan busts VMEM: stage A computes t_i = op(V)_i · x_slice into a
    compact [nb·r] staging vector (blocks write disjoint rows i·r), stage B
    accumulates y += op(U)_i · t_i with the normal output tiling.  Each
    stage's VMEM need is one x/t window + the small factor block, so the
    fused path reaches arbitrary block widths."""
    from ..hmatrix.hmatrix import LowRankBucket

    assert isinstance(bucket, LowRankBucket)
    bm, bn = bucket.block_shape
    r = bucket.rank_padded
    r_pad = max(8, -(-r // 8) * 8)
    nb = int(np.asarray(bucket.t_off).shape[0])
    trans = out_side == "s"
    # both stage factors are kept [nb, r, width] so the (large) block width
    # sits on the LANE dim: stage A contracts width (non-trans plan), stage B
    # contracts r (trans plan, out_side='s') — no 16x lane padding of rank
    if not trans:
        dataA = bucket.V  # [nb, r, bn], contract bn against x
        x_off = bucket.s_off
        dataB = jnp.swapaxes(bucket.U, 1, 2)  # [nb, r, bm]
        y_off = bucket.t_off
    else:
        dataA = jnp.swapaxes(bucket.U, 1, 2)  # [nb, r, bm], contract bm
        x_off = bucket.t_off
        dataB = bucket.V  # [nb, r, bn]
        y_off = bucket.s_off
    if r_pad != r:
        dataA = jnp.pad(dataA, ((0, 0), (0, r_pad - r), (0, 0)))
        dataB = jnp.pad(dataB, ((0, 0), (0, r_pad - r), (0, 0)))

    mid_off = np.arange(nb, dtype=np.int64) * r_pad
    stageA = _DenseStand(dataA, t_off=mid_off, s_off=np.asarray(x_off, np.int64))
    stageB = _chunk_stand_width(
        dataB, mid_off, np.asarray(y_off, np.int64)
    )
    planA = build_tile_plan(stageA, "t", nb * r_pad + 16, tile_rows)
    planB = build_tile_plan(stageB, "s", out_len, tile_rows)
    return planA, planB


import os as _os

_STAGE_B_CHUNK = int(
    _os.environ.get("HTOOL_TPU_STAGE_B_CHUNK", "2048")
)  # max expansion width per stage-B plan entry


def _chunk_stand_width(dataB, mid_off, y_off, chunk=_STAGE_B_CHUNK):
    """Split wide stage-B factor blocks [nb, r, W] into output chunks of at
    most ``chunk`` columns so the out-tile extension zone (E = block width)
    fits the kernel's VMEM gate — the 6272-wide coarse-level low-rank
    blocks otherwise fall back to the XLA gather/scatter path (traced at
    ~2.8 ms of a 21 ms matvec at n=100k).  Each chunk re-reads the same
    r-row staging window (16 rows — negligible)."""
    nb, r, W = int(dataB.shape[0]), int(dataB.shape[1]), int(dataB.shape[2])
    if W <= chunk:
        return _DenseStand(dataB, t_off=mid_off, s_off=y_off)
    n_ch = -(-W // chunk)
    pad_W = n_ch * chunk
    if pad_W != W:
        dataB = jnp.pad(dataB, ((0, 0), (0, 0), (0, pad_W - W)))
    # [nb, r, n_ch*chunk] -> [nb*n_ch, r, chunk] with chunk-major order
    dataC = jnp.swapaxes(
        dataB.reshape(nb, r, n_ch, chunk), 1, 2
    ).reshape(nb * n_ch, r, chunk)
    t_off = np.repeat(mid_off, n_ch)
    s_off = np.repeat(y_off, n_ch) + np.tile(
        np.arange(n_ch, dtype=np.int64) * chunk, nb
    )
    return _DenseStand(dataC, t_off=t_off, s_off=s_off)


class _DenseStand:
    """Minimal dense-bucket stand-in for build_tile_plan."""

    def __init__(self, data, t_off, s_off):
        self.data = data
        self.t_off = t_off
        self.s_off = s_off

    @property
    def block_shape(self):
        return (int(self.data.shape[1]), int(self.data.shape[2]))


@dataclass
class ComplexPlans:
    """Pytree-safe pack of real-plane tile plans for one complex orientation.

    ``kind`` ('cdense' | 'clr') is aux data so the pack can ride through a
    jitted product as an argument."""

    kind: str
    plans: tuple  # (re, im) for cdense; (Ar, Ai, Br, Bi) for clr

    @property
    def out_plan(self):
        return self.plans[0] if self.kind == "cdense" else self.plans[2]


jax.tree_util.register_pytree_node(
    ComplexPlans,
    lambda p: (p.plans, p.kind),
    lambda kind, plans: ComplexPlans(kind, tuple(plans)),
)


def build_tile_plan_complex(bucket, out_side: str, out_len: int,
                            tile_rows: int = _TILE_ROWS):
    """Complex fast path: real/imaginary PLANE plans for one orientation.

    A complex product splits into 4 real products; stacking [Re(x), Im(x)]
    on the RHS axis lets each real plane be read ONCE per application, so
    the traffic equals the complex data volume — the ideal 2x of the real
    row (the reference's complex kernels are first-class,
    ``testing/generator_test.hpp:163-205``).  Dense buckets return
    ``("cdense", plan_re, plan_im)``; low-rank buckets stage through the
    split two-stage structure and return
    ``("clr", planA_re, planA_im, planB_re, planB_im)`` where stage A is
    the V-contraction into the staging vector and stage B the U-expansion
    (recombination between stages happens on the small staging vector)."""
    is_dense = getattr(bucket, "data", None) is not None
    trans = out_side == "s"
    if is_dense:
        t_off = np.asarray(bucket.t_off, np.int64)
        s_off = np.asarray(bucket.s_off, np.int64)
        pre = build_tile_plan(
            _DenseStand(jnp.real(bucket.data), t_off, s_off), out_side,
            out_len, tile_rows)
        pim = build_tile_plan(
            _DenseStand(jnp.imag(bucket.data), t_off, s_off), out_side,
            out_len, tile_rows)
        return ComplexPlans("cdense", (pre, pim))

    bm, bn = bucket.block_shape
    r = bucket.rank_padded
    r_pad = max(8, -(-r // 8) * 8)
    nb = int(np.asarray(bucket.t_off).shape[0])
    if not trans:
        dataA = bucket.V  # [nb, r, bn] contract bn
        x_off = bucket.s_off
        dataB = jnp.swapaxes(bucket.U, 1, 2)  # [nb, r, bm]
        y_off = bucket.t_off
    else:
        dataA = jnp.swapaxes(bucket.U, 1, 2)
        x_off = bucket.t_off
        dataB = bucket.V
        y_off = bucket.s_off
    if r_pad != r:
        dataA = jnp.pad(dataA, ((0, 0), (0, r_pad - r), (0, 0)))
        dataB = jnp.pad(dataB, ((0, 0), (0, r_pad - r), (0, 0)))
    mid_off = np.arange(nb, dtype=np.int64) * r_pad
    mid_len = nb * r_pad + 16
    x_off = np.asarray(x_off, np.int64)
    y_off = np.asarray(y_off, np.int64)
    pAr = build_tile_plan(_DenseStand(jnp.real(dataA), mid_off, x_off), "t", mid_len, tile_rows)
    pAi = build_tile_plan(_DenseStand(jnp.imag(dataA), mid_off, x_off), "t", mid_len, tile_rows)
    pBr = build_tile_plan(
        _chunk_stand_width(jnp.real(dataB), mid_off, y_off), "s", out_len, tile_rows
    )
    pBi = build_tile_plan(
        _chunk_stand_width(jnp.imag(dataB), mid_off, y_off), "s", out_len, tile_rows
    )
    return ComplexPlans("clr", (pAr, pAi, pBr, pBi))


def apply_complex_plans(plan_pack, x_pad, sigma: float, k: int, real_dtype):
    """Apply a complex plan pack to ``x2 = [Re(x) | Im(x)]`` columns.

    ``sigma`` = -1 flips the imaginary plane (conjugated modes 'C'/'conj';
    transposition is baked into the plans).  Returns complex [out_len, k]."""
    x2 = jnp.concatenate(
        [jnp.real(x_pad).astype(real_dtype), jnp.imag(x_pad).astype(real_dtype)],
        axis=1,
    )

    def combine(Y1, Y2):
        yr = Y1[:, :k] - sigma * Y2[:, k:]
        yi = sigma * Y2[:, :k] + Y1[:, k:]
        return yr, yi

    if plan_pack.kind == "cdense":
        pre, pim = plan_pack.plans
        Y1 = tiled_bucket_matvec(pre, x2, real_dtype)
        Y2 = tiled_bucket_matvec(pim, x2, real_dtype)
        yr, yi = combine(Y1, Y2)
        # lax.complex, NOT yr + 1j*yi: the latter device_puts a host complex
        # scalar when called eagerly, which some TPU runtimes cannot do
        return jax.lax.complex(yr, yi)
    pAr, pAi, pBr, pBi = plan_pack.plans
    T1 = tiled_bucket_matvec(pAr, x2, real_dtype)
    T2 = tiled_bucket_matvec(pAi, x2, real_dtype)
    sr, si = combine(T1, T2)
    s2 = jnp.concatenate([sr, si], axis=1)
    Y1 = tiled_bucket_matvec(pBr, s2, real_dtype)
    Y2 = tiled_bucket_matvec(pBi, s2, real_dtype)
    yr, yi = combine(Y1, Y2)
    return jax.lax.complex(yr, yi)


def complex_plans_ok(plan_pack, k: int, real_dtype) -> bool:
    """All member plans of a complex pack fit the kernel gate at 2k RHS."""
    return all(tiled_matvec_ok(real_dtype, 2 * k, p) for p in plan_pack.plans)


def tiled_matvec_ok(dtype, k: int, plan: TilePlan) -> bool:
    """Gate: Mosaic dtype + the tile buffer and step payload fit VMEM."""
    import os

    mode = os.environ.get("HTOOL_TPU_PALLAS", "auto")
    if mode == "0":
        return False
    if not (mode == "interpret" or jax.default_backend() == "tpu"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return False
    item = jnp.dtype(dtype).itemsize
    lanes_k = _lanes(k)
    tile_bytes = (plan.T + plan.E) * lanes_k * item
    if plan.kind == "dense":
        blk = plan.data.shape[1] * _lanes(plan.data.shape[2]) * item
    else:
        r8 = -(-plan.U.shape[1] // 8) * 8  # U transposed [nb, r, bm]
        blk = r8 * (_lanes(plan.U.shape[2]) + _lanes(plan.V.shape[2])) * item
    step = plan.G * (blk + (plan.in_w + plan.out_w) * lanes_k * item)
    return 2 * tile_bytes + 2 * step <= _VMEM_BUDGET


def _tiled_kernel(kind: str, trans: bool, G: int, out_w: int, in_w: int,
                  n_pre: int, *refs):
    """refs = (prefetch scalars..., block arrays..., x windows x G, out).

    The x windows are sublane-ALIGNED Element windows of in_w + ALIGN rows;
    each block's true slice starts at the prefetched remainder offset."""
    pl, _ = _pl_mods()
    scalars = refs[:n_pre]
    tile_ref, first_ref, out_rel_ref, rem_ref = (
        scalars[0], scalars[1], scalars[2], scalars[3],
    )
    rest = refs[n_pre:]
    if kind == "dense":
        d_ref = rest[0]
        x_refs = rest[1 : 1 + G]
    else:
        u_ref, v_ref = rest[0], rest[1]
        x_refs = rest[2 : 2 + G]
    out_ref = rest[-1]
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base_i = i * G
    xg = jnp.stack(
        [x_refs[g][pl.ds(rem_ref[base_i + g], in_w), :] for g in range(G)]
    )  # [G, in_w, k]
    hi = jax.lax.Precision.HIGHEST
    if kind == "dense":
        blk = d_ref[:]  # [G, bm, bn]
        cdim = 1 if trans else 2
        contrib = jax.lax.dot_general(
            blk, xg, dimension_numbers=(((cdim,), (1,)), ((0,), (0,))),
            preferred_element_type=out_ref.dtype, precision=hi,
        )
    else:
        Ut = u_ref[:]  # [G, r, bm] (transposed storage)
        V = v_ref[:]
        if trans:
            # y_s += (U V)^T x: t = U^T x = Ut x; contrib = V^T t
            t = jax.lax.dot_general(
                Ut, xg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=out_ref.dtype, precision=hi)
            contrib = jax.lax.dot_general(
                V, t, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=out_ref.dtype, precision=hi)
        else:
            # y_t += U (V x): t = V x; contrib = Ut^T t
            t = jax.lax.dot_general(
                V, xg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=out_ref.dtype, precision=hi)
            contrib = jax.lax.dot_general(
                Ut, t, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=out_ref.dtype, precision=hi)

    base = i * G
    for g in range(G):
        off = out_rel_ref[base + g]
        out_ref[0, pl.ds(off, out_w), :] = (
            out_ref[0, pl.ds(off, out_w), :] + contrib[g]
        )


_pl_cache = None


def _pl_mods():
    global _pl_cache
    if _pl_cache is None:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        _pl_cache = (pl, pltpu)
    return _pl_cache


def tiled_bucket_matvec(plan: TilePlan, x_pad, dtype):
    """Run the tiled kernel for one bucket term: returns y [out_len, k].

    ``x_pad`` must have at least ALIGN extra padding rows beyond any block's
    input extent (the aligned Element windows over-read by up to ALIGN)."""
    pl, pltpu = _pl_mods()
    k = x_pad.shape[1]
    T, E, G = plan.T, plan.E, plan.G
    # sublane tile of the dtype: Element window starts must be provably
    # aligned to it, so windows are aligned down and shifted in-kernel
    ALIGN = 8 if jnp.dtype(dtype).itemsize == 4 else 16
    in_al = (plan.in_off // ALIGN) * ALIGN
    rem = plan.in_off - in_al

    n_pre = 5  # tile_of, first_of, out_rel, rem, in_al (index maps)
    grid = (plan.n_steps,)

    if plan.kind == "dense":
        bm, bn = plan.data.shape[1], plan.data.shape[2]
        block_arrays = [_pin_row_major(plan.data.astype(dtype))]
        block_specs = [
            pl.BlockSpec((G, bm, bn), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
    else:
        r, bm = plan.U.shape[1], plan.U.shape[2]  # U transposed [nb, r, bm]
        bn = plan.V.shape[2]
        block_arrays = [
            _pin_row_major(plan.U.astype(dtype)),
            _pin_row_major(plan.V.astype(dtype)),
        ]
        block_specs = [
            pl.BlockSpec((G, r, bm), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, r, bn), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    in_w = plan.in_w

    def x_spec(g):
        def idx(i, tf, ff, orr, rm, ia):
            return (pl.multiple_of(ia[i * G + g], ALIGN), 0)

        # Mosaic requires all-or-none Element dims in a spec
        return pl.BlockSpec((pl.Element(in_w + ALIGN), pl.Element(k)), idx,
                            memory_space=pltpu.VMEM)

    x_specs = [x_spec(g) for g in range(G)]

    def out_idx(i, tf, ff, orr, rm, ia):
        return (tf[i], 0, 0)

    out_spec = pl.BlockSpec((1, T + E, k), out_idx, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pre,
        grid=grid,
        in_specs=block_specs + x_specs,
        out_specs=out_spec,
    )
    tiles = pl.pallas_call(
        partial(_tiled_kernel, plan.kind, plan.trans, G, plan.out_w, in_w,
                n_pre),
        out_shape=jax.ShapeDtypeStruct((plan.n_tiles, T + E, k), dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(plan.tile_of, plan.first_of, plan.out_rel, rem, in_al,
      *block_arrays, *([x_pad.astype(dtype)] * G))

    # fold: y[t*T : t*T + T + E] += tiles[t]
    body = tiles[:, :T, :].reshape(plan.n_tiles * T, k)
    y = jnp.concatenate([body, jnp.zeros((E, k), dtype)], axis=0)
    ext = tiles[:, T:, :]  # [n_tiles, E, k]
    rows = (jnp.arange(plan.n_tiles) * T + T)[:, None] + jnp.arange(E)[None, :]
    y = y.at[rows.reshape(-1)].add(ext.reshape(-1, k))
    return y[: plan.out_len]
