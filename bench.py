"""Benchmark harness — runs on the real TPU chip (default axon platform).

Produces the BASELINE.md table rows:
- n in {10k, 100k} sphere / regularized-Laplace matvec (compressed
  entries/s, effective GB/s, relative error), the 100k row through the
  tiled Pallas path;
- assembly phase breakdown (block-tree plan / device assembly, cold vs
  warm compile cache);
- BLR LU factorization + solve walltime with the backward-error estimate;
- 8-virtual-device weak-scaling of the distributed matvec on the emulated
  CPU mesh (functional scaling check — the chip is single-device).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} (headline =
10k matvec compressed entries/s vs our recorded bench_baseline.json) plus
all auxiliary metrics on stderr.  The reference publishes no numbers
(BASELINE.md), so vs_baseline is against our own first-round record.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# must be set before the CPU backend initializes (weak-scaling rows)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np


def _bench_matvec(n, nrhs, eps, aux, tiled):
    import jax
    import jax.numpy as jnp

    import htool_tpu as ht
    from htool_tpu.hmatrix.linalg import matvec, prepare_tiled_matvec

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
    sub = rng.choice(n, 256, replace=False)
    A_rows = np.asarray(
        gen.block(jnp.asarray(sub, jnp.int32), jnp.asarray(np.arange(n), jnp.int32))
    )
    y_ref = A_rows @ np.asarray(xc)
    rel = np.linalg.norm(np.asarray(y)[sub] - y_ref) / np.linalg.norm(y_ref)

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
        compressed_entries_per_s=entries_per_s,
        effective_gbytes_per_s=entries_per_s * np.dtype(dtype).itemsize / 1e9,
    )
    return entries_per_s


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


def _bench_weak_scaling(aux):
    """Distributed matvec on the emulated 8-device CPU mesh at fixed
    per-device size (functional weak-scaling; the chip is single-device)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import htool_tpu as ht
    from htool_tpu.parallel import build_distributed_hmatrix

    per_dev = 2000
    rows = {}
    entries = {}
    cpu_devs = jax.devices("cpu")
    # pallas kernels cannot run compiled on the CPU mesh devices
    prev_pallas = os.environ.get("HTOOL_TPU_PALLAS")
    os.environ["HTOOL_TPU_PALLAS"] = "0"
    for P in (1, 2, 4, 8):
        n = per_dev * P
        pts = create_points(n)
        gen = ht.KernelGenerator(
            kernel(), pts.astype(np.float32), pts.astype(np.float32)
        )
        tree = ht.build_cluster_tree(pts, max_leaf_size=128, n_partitions=P)
        mesh = Mesh(np.array(cpu_devs[:P]), ("p",))
        with jax.default_device(cpu_devs[0]):
            D = build_distributed_hmatrix(gen, tree, mesh, epsilon=1e-3, eta=10.0)
            from htool_tpu.parallel import distributed_hmatrix_info

            dinfo = distributed_hmatrix_info(D)
            entries[P] = (float(n) * n) / dinfo.get(
                "compression_ratio", dinfo.get("compression_ratio_mean", 1.0)
            )
            x = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))
            y = D.matvec(x)
            y.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(5):
                y = D.matvec(x)
            y.block_until_ready()
            rows[P] = (time.perf_counter() - t0) / 5
    eff = {}
    for P in (2, 4, 8):
        # weak scaling: the total compressed work grows with n = P*per_dev,
        # so efficiency = per-device throughput relative to P = 1
        thr1 = entries[1] / rows[1]
        thrP = entries[P] / rows[P] / P
        eff[P] = thrP / thr1
    aux["weak_scaling_cpu_mesh"] = dict(
        per_device_n=per_dev,
        matvec_s={str(k): v for k, v in rows.items()},
        per_device_efficiency={str(k): v for k, v in eff.items()},
    )
    if prev_pallas is None:
        os.environ.pop("HTOOL_TPU_PALLAS", None)
    else:
        os.environ["HTOOL_TPU_PALLAS"] = prev_pallas


def create_points(n):
    from htool_tpu.testing import create_sphere

    return create_sphere(n)


def kernel():
    from htool_tpu.testing import laplace_kernel_symmetric

    return laplace_kernel_symmetric


def main():
    import jax

    cache_dir = os.environ.get(
        "HTOOL_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/htool_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp

    # claim the device before timing (the axon chip claim can take minutes
    # right after another process released it)
    jnp.zeros(()).block_until_ready()

    aux = dict(backend=jax.default_backend())
    headline = _bench_matvec(
        int(os.environ.get("BENCH_N", "10000")), 8, 1e-3, aux, tiled=True
    )
    if os.environ.get("BENCH_SKIP_LARGE", "0") != "1":
        try:
            _bench_matvec(100_000, 8, 1e-3, aux, tiled=True)
        except Exception as e:  # pragma: no cover - chip-memory dependent
            aux["matvec_n100000"] = {"error": repr(e)[:200]}
        try:
            _bench_blr(10_000, 1e-4, aux)
        except Exception as e:
            aux["blr_n10000"] = {"error": repr(e)[:200]}
    try:
        _bench_weak_scaling(aux)
    except Exception as e:
        aux["weak_scaling_cpu_mesh"] = {"error": repr(e)[:200]}

    print(json.dumps(aux), file=sys.stderr)

    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    vs = 1.0
    if os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            if base.get("value"):
                vs = headline / float(base["value"])
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "hmatrix_matvec_compressed_entries_per_s",
                "value": headline,
                "unit": "entries/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
