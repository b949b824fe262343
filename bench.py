"""Benchmark harness — runs on the real TPU chip (default axon platform).

Headline workload (BASELINE.md / BASELINE.json configs[0]): 10k-point sphere,
regularized Laplace single-layer kernel, partial ACA at eps=1e-3 — H-matrix
assembly + compressed matvec throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary metrics on stderr.  The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against our own first-round
record when present (bench_baseline.json), else 1.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # persistent XLA compile cache: assembly is a handful of big kernels whose
    # remote-TPU compiles dominate first-run walltime; cache them across runs
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

    import htool_tpu as ht
    from htool_tpu.hmatrix.linalg import matvec
    from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

    n = int(os.environ.get("BENCH_N", "10000"))
    nrhs = int(os.environ.get("BENCH_NRHS", "8"))
    eps = 1e-3
    dtype = np.float32

    pts = create_sphere(n)
    gen = ht.KernelGenerator(
        laplace_kernel_symmetric, pts.astype(dtype), pts.astype(dtype)
    )
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)

    # claim the device before timing (the axon chip claim can take minutes
    # right after another process released it; that's environment setup,
    # not assembly cost)
    jnp.zeros(()).block_until_ready()

    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_assembly = time.perf_counter() - t0

    info = ht.hmatrix_info(H)

    # accuracy spot check on a random column block vs generator
    rng = np.random.RandomState(0)
    xc = jnp.asarray(rng.randn(n, nrhs).astype(dtype))

    # matvec is jitted with H as a pytree ARGUMENT — wrapping it in another
    # jit that closes over H would bake ~GBs of bucket data into the program
    # as constants and blow up remote compile time
    f = lambda x: matvec(H, x)
    y = f(xc)
    y.block_until_ready()  # compile
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(xc)
    y.block_until_ready()
    t_mv = (time.perf_counter() - t0) / iters

    # compressed entries touched per matvec (dense mn + lr r(m+n)), the
    # nnz/s analog from BASELINE.json
    generated = (float(n) * n) / info["compression_ratio"]
    entries_per_s = generated * nrhs / t_mv
    gbytes_per_s = entries_per_s * np.dtype(dtype).itemsize / 1e9

    # accuracy: matvec vs direct generator product on a subsample
    sub = rng.choice(n, 512, replace=False)
    A_rows = np.asarray(gen.block(sub, np.arange(n)))
    y_ref = A_rows @ np.asarray(xc)
    rel = np.linalg.norm(np.asarray(y)[sub] - y_ref) / np.linalg.norm(y_ref)

    aux = dict(
        n=n,
        nrhs=nrhs,
        epsilon=eps,
        assembly_s=t_assembly,
        matvec_s=t_mv,
        compression_ratio=info["compression_ratio"],
        space_saving=info["space_saving"],
        rank_mean=info["rank_mean"],
        n_false_positive=info["n_false_positive"],
        matvec_rel_error=float(rel),
        compressed_entries_per_s=entries_per_s,
        effective_gbytes_per_s=gbytes_per_s,
        backend=jax.default_backend(),
    )
    print(json.dumps(aux), file=sys.stderr)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            if base.get("value"):
                vs = entries_per_s / float(base["value"])
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "hmatrix_matvec_compressed_entries_per_s",
                "value": entries_per_s,
                "unit": "entries/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
