"""Benchmark harness — runs on the real TPU chip (default axon platform).

Produces the BASELINE.md table rows:
- kernel_smoke: tiny COMPILED (non-interpret) exercise of every Pallas
  kernel variant (dense / low-rank / transposed / split-LR / complex
  plan pack) so on-chip lowering failures are attributable per kernel;
- n in {10k, 100k} sphere / regularized-Laplace matvec (compressed
  entries/s, effective GB/s, relative error) through the tiled Pallas
  path; rel error MUST be < epsilon (the reference's acceptance
  contract, test_hmatrix_build.hpp:191);
- complex64 (Helmholtz-like) 100k matvec through the re/im-plane tiled
  fast path (complex data crosses the host boundary as split float
  planes — utils/cxfer.py — because some TPU runtimes cannot transfer
  complex arrays);
- assembly phase breakdown (block-tree plan / device assembly, cold vs
  warm compile cache);
- hierarchical (two-level) LU factorization + solve walltime with the
  backward-error estimate, 10k and 100k;
- the flagship DDM workload (use_ddm_solver.cpp:59-136): 100k-point
  sphere, one-level RAS + GMRES to 1e-6 — iterations, time-to-tol,
  phase breakdown;
- static weak-scaling accounting for P in {1..8}: per-device compressed
  bytes / FLOP balance and collective payload bytes from the partition
  plan (exact host-side accounting; the chip is single-device so
  walltime scaling cannot be measured here).

EVERY ROW RUNS IN ITS OWN SUBPROCESS: one backend failure cannot poison
the remaining rows (in round 3 a single complex-transfer failure
cascaded into 5/7 rows dying with the same error), and a failed row is
retried once to absorb transient relay flakiness.  Row errors and
accuracy violations are LOUD: they are recorded per row AND fail the
bench with a nonzero exit after all rows have printed.

RESULTS STREAM: after every row the cumulative aux JSON is printed to
stderr (and BENCH_AUX.json rewritten) and a fresh headline JSON line is
printed to stdout, so a driver kill preserves all completed rows; rows
run most-important-first (DDM flagship right after the headline) under a
global wall budget (BENCH_TOTAL_BUDGET_S, default 1500 s).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
(headline = 10k matvec compressed entries/s vs our recorded
bench_baseline.json) plus all auxiliary metrics on stderr.  The
reference publishes no numbers (BASELINE.md), so vs_baseline is against
our own first-round record.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# must be set before the CPU backend initializes (weak-scaling rows)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np

# accuracy-contract violations collected across rows; nonzero exit at the end
_VIOLATIONS = []

_ROW_TIMEOUT_S = int(os.environ.get("BENCH_ROW_TIMEOUT", "2700"))


def _bench_kernel_smoke(aux):
    """Tiny compiled (non-interpret) exercise of each Pallas kernel variant.

    Failures here attribute on-chip lowering problems to a specific kernel
    before the big rows spend minutes of assembly (VERDICT r3 item 10)."""
    import jax
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.hmatrix import DenseBucket, LowRankBucket
    from htool_tpu.ops.tiled_matvec import (
        apply_complex_plans,
        build_tile_plan,
        build_tile_plan_complex,
        build_tile_plan_lr_split,
        tiled_bucket_matvec,
    )

    rng = np.random.RandomState(0)
    n = 2048
    nb, bm, bn, r = 8, 256, 256, 8
    offs = np.arange(nb, dtype=np.int64) * 256
    results = {}

    def check(name, fn):
        try:
            t0 = time.perf_counter()
            got, want = fn()
            err = float(
                np.linalg.norm(np.asarray(got) - want) / max(np.linalg.norm(want), 1e-30)
            )
            ok = err < 1e-4
            results[name] = {"ok": bool(ok), "rel_err": err,
                             "wall_s": time.perf_counter() - t0}
            if not ok:
                _VIOLATIONS.append(f"kernel_smoke:{name}: rel_err {err:.3e}")
        except Exception as e:  # pragma: no cover - chip dependent
            results[name] = {"ok": False, "error": repr(e)[:200]}
            _VIOLATIONS.append(f"kernel_smoke:{name}: {repr(e)[:100]}")

    data = rng.randn(nb, bm, bn).astype(np.float32)
    U = rng.randn(nb, bm, r).astype(np.float32)
    V = rng.randn(nb, r, bn).astype(np.float32)
    x = rng.randn(n + 64, 8).astype(np.float32)
    szs = np.full(nb, bm, np.int64)

    def dense_ref(mats, trans=False, xin=None):
        xin = x if xin is None else xin
        y = np.zeros((n + 64, 8), np.float64)
        for i in range(nb):
            blk = mats[i].T if trans else mats[i]
            w = blk.shape[0]
            y[offs[i] : offs[i] + w] += blk.astype(y.dtype) @ xin[
                offs[i] : offs[i] + blk.shape[1]
            ].astype(y.dtype)
        return y

    def mk_dense(d=data):
        return DenseBucket(
            data=jnp.asarray(d), t_off=jnp.asarray(offs), s_off=jnp.asarray(offs),
            t_sizes=szs, s_sizes=szs,
        )

    def mk_lr():
        return LowRankBucket(
            U=jnp.asarray(U), V=jnp.asarray(V), t_off=jnp.asarray(offs),
            s_off=jnp.asarray(offs), t_sizes=szs, s_sizes=szs,
            ranks=np.full(nb, r, np.int64),
        )

    lr_ref = dense_ref([U[i] @ V[i] for i in range(nb)])

    def run_dense():
        plan = build_tile_plan(mk_dense(), "t", n + 64)
        y = tiled_bucket_matvec(plan, jnp.asarray(x), jnp.float32)
        return y, dense_ref(data)

    def run_dense_trans():
        plan = build_tile_plan(mk_dense(), "s", n + 64)
        y = tiled_bucket_matvec(plan, jnp.asarray(x), jnp.float32)
        return y, dense_ref(data, trans=True)

    def run_lr():
        plan = build_tile_plan(mk_lr(), "t", n + 64)
        y = tiled_bucket_matvec(plan, jnp.asarray(x), jnp.float32)
        return y, lr_ref

    def run_lr_split():
        pA, pB = build_tile_plan_lr_split(mk_lr(), "t", n + 64)
        t = tiled_bucket_matvec(pA, jnp.asarray(x), jnp.float32)
        y = tiled_bucket_matvec(pB, t, jnp.float32)
        return y, lr_ref

    def run_complex():
        from htool_tpu.utils.cxfer import to_device, to_host

        zdata = (data + 1j * rng.randn(nb, bm, bn)).astype(np.complex64)
        zb = mk_dense(to_device(zdata))
        pack = build_tile_plan_complex(zb, "t", n + 64)
        xz = (x + 1j * rng.randn(n + 64, 8)).astype(np.complex64)
        y = apply_complex_plans(pack, to_device(xz), 1.0, 8, jnp.float32)
        ref = np.zeros((n + 64, 8), np.complex128)
        for i in range(nb):
            ref[offs[i] : offs[i] + bm] += zdata[i].astype(np.complex128) @ xz[
                offs[i] : offs[i] + bn
            ].astype(np.complex128)
        return to_host(y), ref

    check("dense_tiled", run_dense)
    check("dense_tiled_trans", run_dense_trans)
    check("lr_tiled", run_lr)
    check("lr_split_tiled", run_lr_split)
    check("complex_pack", run_complex)
    aux["kernel_smoke"] = results


def _bench_matvec(n, nrhs, eps, aux, tiled):
    import jax
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.linalg import matvec, matvec_user, prepare_tiled_matvec

    dtype = np.float32
    pts = create_points(n)
    gen = ht.KernelGenerator(
        kernel(), pts.astype(dtype), pts.astype(dtype)
    )
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)

    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_assembly = time.perf_counter() - t0
    info = ht.hmatrix_info(H)

    # warm re-assembly: same shapes, compile cache hot -> device-time view
    t0 = time.perf_counter()
    H2 = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H2.dense_buckets])
    t_assembly_warm = time.perf_counter() - t0
    del H2

    t_prepare = 0.0
    if tiled:
        t0 = time.perf_counter()
        prepare_tiled_matvec(H)
        t_prepare = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    xc = jnp.asarray(rng.randn(n, nrhs).astype(dtype))
    # matvec is jitted with H as a pytree ARGUMENT — never wrap it in a jit
    # that closes over H (bucket data would bake in as HLO constants)
    y = matvec(H, xc)
    y.block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y = matvec(H, xc)
    y.block_until_ready()
    t_mv = (time.perf_counter() - t0) / iters

    generated = (float(n) * n) / info["compression_ratio"]
    entries_per_s = generated * nrhs / t_mv
    # error oracle in USER numbering -> the user-numbering product wrapper
    # (matvec alone is cluster-numbered; rounds 1-2 compared it against the
    # user-numbered dense rows, reporting a numbering artifact as 'error')
    yu = np.asarray(matvec_user(H, xc))
    sub = rng.choice(n, 256, replace=False)
    A_rows = np.asarray(
        gen.block(jnp.asarray(sub, jnp.int32), jnp.asarray(np.arange(n), jnp.int32))
    )
    y_ref = A_rows.astype(np.float64) @ np.asarray(xc, np.float64)
    rel = np.linalg.norm(yu[sub] - y_ref) / np.linalg.norm(y_ref)

    aux[f"matvec_n{n}"] = dict(
        n=n,
        nrhs=nrhs,
        epsilon=eps,
        assembly_s=t_assembly,
        assembly_warm_s=t_assembly_warm,
        block_tree_plan_s=info.get("block_tree_walltime", 0.0),
        tiled_prepare_s=t_prepare,
        matvec_s=t_mv,
        compression_ratio=info["compression_ratio"],
        rank_mean=info["rank_mean"],
        n_false_positive=info["n_false_positive"],
        matvec_rel_error=float(rel),
        accuracy_ok=bool(rel < eps),
        compressed_entries_per_s=entries_per_s,
        effective_gbytes_per_s=entries_per_s * np.dtype(dtype).itemsize / 1e9,
    )
    if not rel < eps:
        _VIOLATIONS.append(f"matvec_n{n}: rel_error {rel:.3e} >= eps {eps:g}")
    return entries_per_s


def _bench_complex_matvec(n, nrhs, eps, aux):
    """Complex64 tiled fast path (re/im plane plans) — target within 2x of
    the real-f32 row at equal n (the complex data volume is exactly 2x).

    All complex host<->device crossings go through utils/cxfer (split
    float planes): complex transfers are UNIMPLEMENTED on the axon relay
    and one failed transfer poisons the process (round-3 postmortem)."""
    import jax
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.linalg import matvec, matvec_user, prepare_tiled_matvec
    from htool_tpu.testing import laplace_kernel_complex_symmetric
    from htool_tpu.utils.cxfer import to_device, to_host

    pts = create_points(n).astype(np.float32)
    gen = ht.KernelGenerator(
        laplace_kernel_complex_symmetric, pts, pts, dtype=jnp.complex64
    )
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)
    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_assembly = time.perf_counter() - t0
    info = ht.hmatrix_info(H)
    t0 = time.perf_counter()
    prepare_tiled_matvec(H)
    t_prepare = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    xc = to_device(
        (rng.randn(n, nrhs) + 1j * rng.randn(n, nrhs)).astype(np.complex64)
    )
    y = matvec(H, xc)
    y.block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y = matvec(H, xc)
    y.block_until_ready()
    t_mv = (time.perf_counter() - t0) / iters

    generated = (float(n) * n) / info["compression_ratio"]
    entries_per_s = generated * nrhs / t_mv
    yu = to_host(matvec_user(H, xc))
    sub = rng.choice(n, 256, replace=False)
    A_rows = to_host(
        gen.block(jnp.asarray(sub, jnp.int32), jnp.asarray(np.arange(n), jnp.int32))
    )
    y_ref = A_rows.astype(np.complex128) @ to_host(xc).astype(np.complex128)
    rel = np.linalg.norm(yu[sub] - y_ref) / np.linalg.norm(y_ref)
    aux[f"complex_matvec_n{n}"] = dict(
        n=n,
        nrhs=nrhs,
        epsilon=eps,
        assembly_s=t_assembly,
        tiled_prepare_s=t_prepare,
        matvec_s=t_mv,
        compression_ratio=info["compression_ratio"],
        matvec_rel_error=float(rel),
        accuracy_ok=bool(rel < eps),
        compressed_entries_per_s=entries_per_s,
        effective_gbytes_per_s=entries_per_s * 8 / 1e9,
    )
    if not rel < eps:
        _VIOLATIONS.append(
            f"complex_matvec_n{n}: rel_error {rel:.3e} >= eps {eps:g}"
        )


def _bench_blr2(n, eps, aux):
    """Hierarchical (two-level) factorization — the production H-LU path
    (factorization.hpp:19-79 asymptotics; VERDICT r2 item 1)."""
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.blr2 import blr2_lu, blr2_solve, build_blr2

    dtype = np.float32
    pts = create_points(n)
    gen = ht.KernelGenerator(kernel(), pts.astype(dtype), pts.astype(dtype))
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)
    t0 = time.perf_counter()
    A = build_blr2(gen, tree, epsilon=eps)
    import jax

    jax.block_until_ready(A.pU)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    F = blr2_lu(A, error_estimate=True)
    jax.block_until_ready(F.pU)
    t_lu = time.perf_counter() - t0
    b = jnp.asarray(np.random.RandomState(1).randn(n, 8).astype(dtype))
    x = blr2_solve(F, b)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = blr2_solve(F, b)
    x.block_until_ready()
    t_solve = (time.perf_counter() - t0) / 10
    aux[f"blr2_n{n}"] = dict(
        n=n,
        epsilon=eps,
        build_s=t_build,
        build_aca_s=A.info.get("offdiag_aca_walltime"),
        build_diag_s=A.info.get("diag_build_walltime"),
        lu_s=t_lu,
        solve_s=t_solve,
        backward_error_est=F.info.get("backward_error_est"),
        n_rank_capped=F.info.get("n_rank_capped_pairs"),
        diag_mode=A.diag_mode,
        n_levels=A.info.get("n_levels", 2),
        factor_bytes=F.memory_bytes(),
    )
    bw = F.info.get("backward_error_est")
    if bw is not None and not bw < 100 * eps:
        _VIOLATIONS.append(f"blr2_n{n}: backward_error {bw:.3e} >= 100*eps")


def _bench_ddm(n, aux):
    """Flagship workload (use_ddm_solver.cpp:59-136 at BASELINE's 100k
    scale): sphere, H-matrix operator, one-level RAS + GMRES to 1e-6."""
    import jax
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.linalg import prepare_tiled_matvec
    from htool_tpu.solvers import DDMSolver

    dtype = np.float32
    eps = 1e-3
    # 64 subdomains: the dense local factors ([P, n_ext, n_ext]) live
    # INSIDE the jitted Krylov loop; at P=16 (n_ext~6.7k) the loop
    # program needs ~20 GB of HLO temps and cannot compile on a 16 GB
    # chip — subdomain count is the granularity knob (utility.hpp:56)
    P = 64
    tol = 1e-6
    pts = create_points(n)
    gen = ht.KernelGenerator(kernel(), pts.astype(dtype), pts.astype(dtype))
    tree = ht.build_cluster_tree(pts, max_leaf_size=256, n_partitions=P)
    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_assembly = time.perf_counter() - t0
    prepare_tiled_matvec(H)

    t0 = time.perf_counter()
    solver = DDMSolver(
        H, gen, tree, schwarz="ras", overlap_radius=0.02, local_solver="dense"
    )
    t_facto = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    x_true = rng.randn(n).astype(dtype)
    # rhs via the compressed operator keeps the oracle consistent at f32
    b = np.asarray(H @ jnp.asarray(x_true))
    t0 = time.perf_counter()
    x, infos = solver.solve(b, tol=tol, krylov="gmres", restart=60, maxiter=200)
    t_solve = time.perf_counter() - t0
    # warm re-solve: same shapes, program cached -> true time-to-tol
    t0 = time.perf_counter()
    x, infos = solver.solve(b, tol=tol, krylov="gmres", restart=60, maxiter=200)
    t_solve_warm = time.perf_counter() - t0
    res = float(
        np.linalg.norm(np.asarray(H @ jnp.asarray(np.asarray(x))) - b)
        / np.linalg.norm(b)
    )
    aux[f"ddm_n{n}"] = dict(
        n=n,
        subdomains=P,
        epsilon=eps,
        tol=tol,
        assembly_s=t_assembly,
        facto_one_level_s=t_facto,
        solve_s=t_solve,
        solve_warm_s=t_solve_warm,
        iterations=infos.get("Nb_it"),
        residual=res,
        converged=bool(res < 10 * tol),
    )
    if not res < 10 * tol:
        _VIOLATIONS.append(f"ddm_n{n}: residual {res:.3e} >= 10*tol")


def _bench_ddm_two_level(n, aux):
    """Two-level GenEO DDM on-chip (BASELINE's two-level target at a
    single-chip-affordable scale): sphere, RAS + GenEO(additive) + GMRES,
    sharded coarse store (no [N, nc] basis).  Reports the reference's
    GenEO phase timings (ddm.hpp:80-122)."""
    import jax
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.linalg import matvec as h_matvec
    from htool_tpu.hmatrix.linalg import prepare_tiled_matvec
    from htool_tpu.solvers import DDMSolver
    from htool_tpu.solvers.ddm import build_geometric_overlap
    from htool_tpu.solvers.geneo import build_geneo_coarse_space

    dtype = np.float32
    eps = 1e-3
    P = 8
    tol = 1e-6
    pts = create_points(n)
    gen = ht.KernelGenerator(kernel(), pts.astype(dtype), pts.astype(dtype))
    tree = ht.build_cluster_tree(pts, max_leaf_size=256, n_partitions=P)
    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_assembly = time.perf_counter() - t0
    prepare_tiled_matvec(H)

    overlap = build_geometric_overlap(tree, 0.05)
    infos = {}
    A_apply = lambda x: h_matvec(H, x, op="N")
    t0 = time.perf_counter()
    coarse = build_geneo_coarse_space(
        gen, tree, overlap, A_apply, nu=2, symmetry="S", store="local",
        infos=infos,
    )
    t_coarse = time.perf_counter() - t0
    t0 = time.perf_counter()
    solver = DDMSolver(
        H, gen, tree, schwarz="ras", overlap=overlap, coarse=coarse,
        coarse_correction="additive", local_solver="dense",
    )
    t_facto = time.perf_counter() - t0
    rng = np.random.RandomState(0)
    x_true = rng.randn(n).astype(dtype)
    b = np.asarray(H @ jnp.asarray(x_true))
    # one-level comparison run for the iteration-reduction evidence
    solver1 = DDMSolver(
        H, gen, tree, schwarz="ras", overlap=overlap, local_solver="dense"
    )
    _, infos1 = solver1.solve(b, tol=tol, krylov="gmres", restart=60, maxiter=200)
    t0 = time.perf_counter()
    x, infos2 = solver.solve(b, tol=tol, krylov="gmres", restart=60, maxiter=200)
    t_solve = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, infos2 = solver.solve(b, tol=tol, krylov="gmres", restart=60, maxiter=200)
    t_solve_warm = time.perf_counter() - t0
    res = float(
        np.linalg.norm(np.asarray(H @ jnp.asarray(np.asarray(x))) - b)
        / np.linalg.norm(b)
    )
    aux[f"ddm2_n{n}"] = dict(
        n=n,
        subdomains=P,
        tol=tol,
        assembly_s=t_assembly,
        coarse_space_s=t_coarse,
        geneo_evp_s=infos.get("GenEO_geev_walltime"),
        geneo_ztaz_s=infos.get("GenEO_ZtAZ_walltime"),
        coarse_size=infos.get("GenEO_coarse_space_size"),
        facto_one_level_s=t_facto,
        solve_s=t_solve,
        solve_warm_s=t_solve_warm,
        iterations_one_level=infos1.get("Nb_it"),
        iterations_two_level=infos2.get("Nb_it"),
        residual=res,
        converged=bool(res < 10 * tol),
    )
    if not res < 10 * tol:
        _VIOLATIONS.append(f"ddm2_n{n}: residual {res:.3e} >= 10*tol")


def _bench_weak_scaling_static(n, aux):
    """Exact host-side weak-scaling accounting (VERDICT r2 item 9): from one
    built H-matrix + the partition plan, report per-device compressed bytes
    and matvec FLOP balance, and the collective payload bytes per matvec for
    P in {1,2,4,8} — what actually rides ICI in the l2l product
    (all_gather of x 'N' / psum_scatter of y 'T').  Replaces the CPU-thread
    walltime row, which measured host collective overhead, not ICI."""
    import htool_tpu as ht

    dtype = np.float32
    itemsize = np.dtype(dtype).itemsize
    eps = 1e-3
    pts = create_points(n)
    gen = ht.KernelGenerator(kernel(), pts.astype(dtype), pts.astype(dtype))
    rows = {}
    for P in (1, 2, 4, 8):
        tree = ht.build_cluster_tree(pts, max_leaf_size=256, n_partitions=P)
        H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
        offs, szs = tree.partition_offsets_sizes()
        bounds = np.asarray(offs, np.int64)
        ends = bounds + np.asarray(szs, np.int64)
        per_dev_entries = np.zeros(P, np.int64)
        for b in H.dense_buckets:
            t_off = np.asarray(b.t_off)
            own = np.searchsorted(ends, t_off, side="right")
            sz = int(b.data.shape[1]) * int(b.data.shape[2])
            np.add.at(per_dev_entries, own, sz)
        for b in H.lr_buckets:
            t_off = np.asarray(b.t_off)
            own = np.searchsorted(ends, t_off, side="right")
            bm, bn = b.block_shape
            sz = int(b.rank_padded) * (bm + bn)
            np.add.at(per_dev_entries, own, sz)
        flops = per_dev_entries * 2  # one mul+add per stored entry per rhs col
        comm_N = (n - n // P) * itemsize  # all_gather recv bytes per device
        comm_T = n * itemsize  # psum_scatter reduce bytes per device
        total = float(per_dev_entries.sum())
        rows[str(P)] = dict(
            per_device_entries_max=int(per_dev_entries.max()),
            per_device_entries_mean=total / P,
            balance=float(per_dev_entries.max() / (total / P)),
            flops_per_device_mean=float(flops.mean()),
            collective_bytes_N=int(comm_N),
            collective_bytes_T=int(comm_T),
            comm_to_compute_bytes=float(comm_N / (per_dev_entries.mean() * itemsize)),
        )
        del H
    aux["weak_scaling_static"] = dict(n=n, per_P=rows)


def _bench_blr(n, eps, aux):
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.blr import blr_lu, blr_solve, build_blr

    dtype = np.float32
    pts = create_points(n)
    gen = ht.KernelGenerator(kernel(), pts.astype(dtype), pts.astype(dtype))
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)
    t0 = time.perf_counter()
    A = build_blr(gen, tree, epsilon=eps, eta=10.0, block_size=512)
    A.D.block_until_ready()
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    F = blr_lu(A, error_estimate=True)
    F.D.block_until_ready()
    t_lu = time.perf_counter() - t0
    b = jnp.asarray(np.random.RandomState(1).randn(n, 8).astype(dtype))
    x = blr_solve(F, b)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = blr_solve(F, b)
    x.block_until_ready()
    t_solve = (time.perf_counter() - t0) / 10
    aux[f"blr_n{n}"] = dict(
        n=n,
        build_s=t_build,
        lu_s=t_lu,
        solve_s=t_solve,
        backward_error_est=F.info.get("backward_error_est"),
        n_rank_capped=F.info.get("n_rank_capped_cells"),
        compression=A.compression_info()["compression_ratio"],
    )


def _bench_assembly_cold(n, aux):
    """True COLD assembly: the subprocess env points the persistent XLA
    compile cache at a fresh temp dir (set by the parent, see
    _run_row_subprocess), so every kernel compiles from scratch.  Records
    the real first-user experience the warm rows hide (VERDICT r4 weak #5:
    r3 cold = 602 s at 10k; commit 5f830f1 claims 158 -> 22 compiles)."""
    import jax

    import htool_tpu as ht

    dtype = np.float32
    eps = 1e-3
    pts = create_points(n)
    gen = ht.KernelGenerator(kernel(), pts.astype(dtype), pts.astype(dtype))
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)
    n_compiles = [0]
    try:
        from jax._src import monitoring

        def _count(event, **kw):
            if "compil" in event:
                n_compiles[0] += 1

        monitoring.register_event_listener(_count)
    except Exception:
        pass
    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    H2 = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H2.dense_buckets])
    t_warm = time.perf_counter() - t0
    aux[f"assembly_cold_n{n}"] = dict(
        n=n,
        assembly_cold_s=t_cold,
        assembly_warm_s=t_warm,
        n_compile_events=n_compiles[0],
        cache_dir=os.environ.get("HTOOL_TPU_COMPILE_CACHE", ""),
    )


def create_points(n):
    from htool_tpu.testing import create_sphere

    return create_sphere(n)


def kernel():
    from htool_tpu.testing import laplace_kernel_symmetric

    return laplace_kernel_symmetric


# ---------------------------------------------------------------------------
# row registry + subprocess isolation
# ---------------------------------------------------------------------------

def _setup_jax():
    import jax

    cache_dir = os.environ.get(
        "HTOOL_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/htool_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERYTHING: on the remote-compile relay even trivial op
        # compiles cost seconds, and they dominate cold assembly
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import jax.numpy as jnp

    # claim the device before timing (the axon chip claim can take minutes
    # right after another process released it)
    jnp.zeros(()).block_until_ready()
    return jax


def _row_registry():
    small_n = int(os.environ.get("BENCH_N", "10000"))
    return {
        "kernel_smoke": lambda aux: _bench_kernel_smoke(aux),
        f"matvec_n{small_n}": lambda aux: _bench_matvec(small_n, 8, 1e-3, aux, tiled=True),
        "matvec_n100000": lambda aux: _bench_matvec(100_000, 8, 1e-3, aux, tiled=True),
        "complex_matvec_n100000": lambda aux: _bench_complex_matvec(100_000, 8, 1e-3, aux),
        "blr_n10000": lambda aux: _bench_blr(10_000, 1e-4, aux),
        "blr2_n10000": lambda aux: _bench_blr2(10_000, 1e-4, aux),
        "blr2_n100000": lambda aux: _bench_blr2(100_000, 1e-4, aux),
        "ddm_n100000": lambda aux: _bench_ddm(100_000, aux),
        "ddm2_n20000": lambda aux: _bench_ddm_two_level(20_000, aux),
        "weak_scaling_static": lambda aux: _bench_weak_scaling_static(small_n, aux),
        f"assembly_cold_n{small_n}": lambda aux: _bench_assembly_cold(small_n, aux),
    }


# Estimated row cost (s) used to gate rows against the global wall budget.
# Sources: BENCH_r04 stderr tail where a row completed; conservative guesses
# for the DDM rows which have never completed on chip.
def _row_estimates():
    small_n = int(os.environ.get("BENCH_N", "10000"))
    # from the r5 end-to-end validation run (fresh compile cache)
    return {
        "kernel_smoke": 85,
        f"matvec_n{small_n}": 75,
        "ddm_n100000": 250,
        "ddm2_n20000": 700,
        "blr2_n10000": 270,
        "matvec_n100000": 230,
        "complex_matvec_n100000": 200,
        "weak_scaling_static": 90,
        f"assembly_cold_n{small_n}": 150,
        "blr_n10000": 120,
        "blr2_n100000": 850,  # incl ~600s cold nested-program compiles under a fresh cache
    }


def _row_names():
    """Most-important-first (VERDICT r4 #1): the flagship DDM rows have been
    lost to kills/order three rounds running — they go right after the
    headline row so a driver timeout can no longer erase them."""
    small_n = int(os.environ.get("BENCH_N", "10000"))
    names = ["kernel_smoke", f"matvec_n{small_n}"]
    if os.environ.get("BENCH_SKIP_LARGE", "0") != "1":
        # matvec_n100000 / complex (bandwidth + complex-ratio contracts) and
        # blr2_n10000 come before blr2_n100000: the 100k LU pays ~600 s of
        # cold nested-program compiles under the bench-local cache and would
        # starve three cheaper rows (its numbers are recorded in BASELINE.md)
        names += ["ddm_n100000", "ddm2_n20000", "blr2_n10000",
                  "matvec_n100000", "complex_matvec_n100000"]
        if os.environ.get("BENCH_FLAT_BLR", "0") == "1":
            names.append("blr_n10000")
    names.append("weak_scaling_static")
    if os.environ.get("BENCH_SKIP_LARGE", "0") != "1":
        names += [f"assembly_cold_n{small_n}", "blr2_n100000"]
    return names


_ROW_SENTINEL = "##BENCH_ROW_RESULT## "


def _run_row_inline(name):
    """Child-process entry: run one row, print its result as a JSON line."""
    jax = _setup_jax()
    aux = {"_backend": jax.default_backend()}
    err = None
    try:
        _row_registry()[name](aux)
    except Exception as e:
        err = repr(e)[:300]
    print(
        _ROW_SENTINEL
        + json.dumps({"aux": aux, "violations": _VIOLATIONS, "error": err})
    )
    sys.stdout.flush()
    # nonzero when the row errored so the parent retries it
    sys.exit(1 if err else 0)


def _run_row_subprocess(name, timeout_s=_ROW_TIMEOUT_S, retries=1, env=None):
    """Run one row isolated; returns (aux_fragment, violations, error).

    A retry runs with a FRESH XLA compile-cache dir: a stale persistent
    cache can hold executables serialized against a previous relay session
    that now fail at runtime with opaque INVALID_ARGUMENT errors (observed
    r5) — recompiling is the fix, so the retry forces it."""
    import tempfile

    last_err = None
    child_env = None
    if env:
        child_env = dict(os.environ)
        child_env.update(env)
    for attempt in range(retries + 1):
        if attempt > 0:
            child_env = dict(os.environ)
            child_env.update(env or {})
            child_env["HTOOL_TPU_COMPILE_CACHE"] = tempfile.mkdtemp(
                prefix="htool_retry_cache_"
            )
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--row", name],
                capture_output=True,
                text=True,
                timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env=child_env,
            )
        except subprocess.TimeoutExpired:
            last_err = f"row timed out after {timeout_s}s"
            continue
        payload = None
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(_ROW_SENTINEL):
                payload = json.loads(line[len(_ROW_SENTINEL):])
                break
        if payload is None:
            tail = (proc.stderr or proc.stdout or "")[-300:]
            last_err = f"row produced no result (rc={proc.returncode}): {tail}"
            continue
        if payload["error"] is None:
            return payload["aux"], payload["violations"], None
        last_err = payload["error"]
        print(
            f"[bench] row {name} attempt {attempt + 1} failed: {last_err}",
            file=sys.stderr,
        )
    return {}, [], last_err


def _headline_line(headline, vs):
    return json.dumps(
        {
            "metric": "hmatrix_matvec_compressed_entries_per_s",
            "value": headline,
            "unit": "entries/s",
            "vs_baseline": vs,
        }
    )


def _vs_baseline(headline):
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    if os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            if base.get("value"):
                return headline / float(base["value"])
        except Exception:
            pass
    return 1.0


def _collect_iterations(aux):
    """Iteration-count regression block (VERDICT r4 #9): Nb_it per solver
    config, compared against the last committed record with a loud warn.
    Mirrors the reference's pinned-convergence tests
    (test_solver_ddm.hpp:211-217)."""
    its = {}
    for row, keys in (
        ("ddm_n100000", [("ras_gmres_1level", "iterations")]),
        ("ddm2_n20000", [("ras_gmres_1level_20k", "iterations_one_level"),
                         ("ras_geneo_additive_2level_20k", "iterations_two_level")]),
    ):
        frag = aux.get(row)
        if isinstance(frag, dict):
            for label, key in keys:
                if frag.get(key) is not None:
                    its[label] = frag[key]
    if not its:
        return
    aux["iterations"] = its
    rec_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_iterations.json"
    )
    try:
        prev = json.load(open(rec_path)) if os.path.exists(rec_path) else {}
    except Exception:
        prev = {}
    for label, nit in its.items():
        old = prev.get(label)
        if old and nit > 1.5 * old:
            print(
                f"[bench] ITERATION REGRESSION {label}: {nit} vs recorded {old}",
                file=sys.stderr,
            )
    try:
        json.dump({**prev, **its}, open(rec_path, "w"), indent=1)
    except Exception:
        pass


def main():
    """Streams results: after EVERY row the cumulative aux JSON goes to
    stderr, a fresh headline JSON line goes to stdout, and BENCH_AUX.json is
    rewritten — a driver kill mid-run preserves everything measured so far
    (round 4 lost all numbers to exactly that, VERDICT r4 weak #1).  A
    global wall budget (BENCH_TOTAL_BUDGET_S, default 1500 s — the driver
    kills at ~1800 s) skips not-yet-started rows loudly when the remaining
    budget is below their estimated cost."""
    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1680"))
    rows = _row_names()
    est = _row_estimates()
    aux = {"backend": None}
    headline = 0.0
    small_n = int(os.environ.get("BENCH_N", "10000"))
    aux_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_AUX.json"
    )

    import tempfile

    # bench-local fresh compile cache shared by all rows: executables this
    # run compiles are reused ONLY within it.  Large pallas-laden programs
    # loaded from an older process's persistent cache fail at runtime with
    # INVALID_ARGUMENT on this relay (r5 postmortem) — each row compiles
    # its own big programs anyway, and XLA-only programs (assembly, ACA)
    # share safely within the run.
    if not os.environ.get("HTOOL_TPU_COMPILE_CACHE"):
        os.environ["HTOOL_TPU_COMPILE_CACHE"] = tempfile.mkdtemp(
            prefix="htool_bench_cache_"
        )

    for name in rows:
        elapsed = time.perf_counter() - t_start
        remaining = budget - elapsed
        # 15% start margin: a row that starts with a hair of budget gets
        # budget-killed mid-row, losing its own result AND the tail rows'
        # slots (observed: blr2_n10000 killed at 284 s with est 270)
        if remaining < 1.15 * est.get(name, 120):
            aux[name] = {"skipped": f"budget: {remaining:.0f}s left < est {est.get(name, 120)}s"}
            print(
                f"[bench] SKIP {name}: {remaining:.0f}s budget left, "
                f"estimated {est.get(name, 120)}s",
                file=sys.stderr,
            )
            continue
        env = None
        if name.startswith("assembly_cold"):
            env = {"HTOOL_TPU_COMPILE_CACHE": tempfile.mkdtemp(prefix="htool_cold_")}
        elif name.startswith("complex_matvec"):
            # observed r5: the complex row's first attempt failed reloading
            # a same-keyed executable compiled by an earlier row; a private
            # fresh cache avoids paying the failed attempt
            env = {"HTOOL_TPU_COMPILE_CACHE": tempfile.mkdtemp(prefix="htool_cplx_")}
        t0 = time.perf_counter()
        frag, violations, err = _run_row_subprocess(
            name,
            timeout_s=min(_ROW_TIMEOUT_S, max(60, int(remaining))),
            retries=1 if remaining > 2 * est.get(name, 120) else 0,
            env=env,
        )
        wall = time.perf_counter() - t0
        backend = frag.pop("_backend", None)
        if aux["backend"] is None and backend:
            aux["backend"] = backend
        budget_bound = remaining < _ROW_TIMEOUT_S
        if err is not None and "timed out" in err and budget_bound:
            # killed by the global budget, not by a hang: a skip, not an
            # accuracy violation
            aux[name] = {"skipped": f"budget-killed after {wall:.0f}s", "wall_s": wall}
            print(f"[bench] BUDGET-KILLED {name} after {wall:.0f}s", file=sys.stderr)
        elif err is not None:
            aux[name] = {"error": err, "wall_s": wall}
            _VIOLATIONS.append(f"{name}: {err[:150]}")
        else:
            aux.update(frag)
        print(f"[bench] {name}: {wall:.1f}s", file=sys.stderr)
        if name == f"matvec_n{small_n}" and "error" not in aux.get(name, {}):
            headline = aux.get(name, {}).get("compressed_entries_per_s") or 0.0
        _VIOLATIONS.extend(violations)
        # stream: cumulative aux -> stderr + file, fresh headline -> stdout
        _collect_iterations(aux)
        print(json.dumps(aux), file=sys.stderr)
        print(_headline_line(headline, _vs_baseline(headline)))
        sys.stdout.flush()
        sys.stderr.flush()
        try:
            json.dump(aux, open(aux_path, "w"), indent=1)
        except Exception:
            pass

    aux["backend"] = aux.get("backend") or "unknown"
    if not headline:
        _VIOLATIONS.append("headline matvec row missing")
    print(json.dumps(aux), file=sys.stderr)
    print(_headline_line(headline, _vs_baseline(headline)))
    if _VIOLATIONS:
        # accuracy contract broken or rows errored: fail AFTER all rows are
        # printed so the numbers are still recorded (reference contract:
        # error < epsilon, test_hmatrix_build.hpp:191)
        print("BENCH VIOLATIONS: " + "; ".join(_VIOLATIONS), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--row":
        _run_row_inline(sys.argv[2])
    else:
        main()
