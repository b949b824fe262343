"""Chip check: ACA stop-factor fix — 10k/100k matvec rel error vs epsilon."""
import os, sys, time
import jax
cache_dir = os.path.expanduser("~/.cache/htool_tpu_xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
import htool_tpu as ht
import htool_tpu.testing as httest
from htool_tpu.hmatrix.linalg import matvec, prepare_tiled_matvec

jnp.zeros(()).block_until_ready()
print("backend:", jax.default_backend(), flush=True)

for n in (10_000, 100_000):
    eps = 1e-3
    pts = httest.create_sphere(n)
    gen = ht.KernelGenerator(
        httest.laplace_kernel_symmetric,
        pts.astype(np.float32), pts.astype(np.float32))
    tree = ht.build_cluster_tree(pts, max_leaf_size=256)
    t0 = time.perf_counter()
    H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
    jax.block_until_ready([b.data for b in H.dense_buckets])
    t_asm = time.perf_counter() - t0
    info = ht.hmatrix_info(H)
    t0 = time.perf_counter()
    prepare_tiled_matvec(H)
    t_prep = time.perf_counter() - t0
    rng = np.random.RandomState(0)
    xc = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    y = matvec(H, xc); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        y = matvec(H, xc)
    y.block_until_ready()
    t_mv = (time.perf_counter() - t0) / 20
    sub = rng.choice(n, 512, replace=False)
    A_rows = np.asarray(gen.block(jnp.asarray(sub, jnp.int32),
                                  jnp.asarray(np.arange(n), jnp.int32)))
    y_ref = A_rows @ np.asarray(xc)
    rel = np.linalg.norm(np.asarray(y)[sub] - y_ref) / np.linalg.norm(y_ref)
    print(f"n={n}: asm {t_asm:.1f}s prep {t_prep:.1f}s mv {t_mv*1e3:.2f}ms "
          f"rel_err {rel:.3e} (eps {eps}) compression {info['compression_ratio']:.1f}x "
          f"rank_mean {info['rank_mean']:.1f} fp {info['n_false_positive']}",
          flush=True)
    del H, gen
print("DONE", flush=True)
