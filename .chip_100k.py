import os, sys, time
import jax
cache_dir = os.path.expanduser("~/.cache/htool_tpu_xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
import htool_tpu as ht
from htool_tpu.hmatrix.linalg import matvec, prepare_tiled_matvec
from htool_tpu.hmatrix.blr2 import build_blr2, blr2_lu, blr2_solve, blr2_backward_error
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

jnp.zeros(()).block_until_ready()
n = 100_000
eps = 1e-3
pts = create_sphere(n)
gen = ht.KernelGenerator(laplace_kernel_symmetric, pts.astype(np.float32), pts.astype(np.float32))
tree = ht.build_cluster_tree(pts, max_leaf_size=256)

t0 = time.perf_counter()
H = ht.build_hmatrix(gen, tree, epsilon=eps, eta=10.0)
jax.block_until_ready([b.data for b in H.dense_buckets])
print(f"assembly: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
prepare_tiled_matvec(H)
print(f"tiled prep: {time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
xc = jnp.asarray(rng.randn(n, 8).astype(np.float32))
y = matvec(H, xc); y.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    y = matvec(H, xc)
y.block_until_ready()
t_mv = (time.perf_counter()-t0)/20
sub = rng.choice(n, 256, replace=False)
A_rows = np.asarray(gen.block(jnp.asarray(sub, jnp.int32), jnp.asarray(np.arange(n), jnp.int32)))
y_ref = A_rows @ np.asarray(xc)
rel = np.linalg.norm(np.asarray(y)[sub] - y_ref) / np.linalg.norm(y_ref)
info = ht.hmatrix_info(H)
print(f"matvec: {t_mv*1e3:.2f}ms rel_err={rel:.3e} (eps={eps}) compression={info['compression_ratio']:.1f}x", flush=True)

# hierarchical LU at 100k, eps=1e-4
eps_f = 1e-4
gen4 = ht.KernelGenerator(laplace_kernel_symmetric, pts.astype(np.float32), pts.astype(np.float32))
t0 = time.perf_counter()
A2 = build_blr2(gen4, tree, epsilon=eps_f, coarse_size=4096, diag_mode="dense")
A2.pU.block_until_ready()
t_build = time.perf_counter()-t0
print(f"blr2 build: {t_build:.1f}s nC={A2.nC} P={A2.P} R={A2.R} failed={A2.info['n_aca_failed']} "
      f"compression={A2.compression_info()['compression_ratio']:.1f}x", flush=True)
t0 = time.perf_counter()
F = blr2_lu(A2, error_estimate=False)
F.Dd.block_until_ready()
t_lu = time.perf_counter()-t0
print(f"blr2 LU: {t_lu:.1f}s capped={F.info['n_rank_capped_pairs']}", flush=True)
t0 = time.perf_counter()
be = blr2_backward_error(A2, F, n_probe=2)
print(f"backward error: {be:.3e} ({time.perf_counter()-t0:.1f}s probe)", flush=True)
b = jnp.asarray(rng.randn(n, 8).astype(np.float32))
x = blr2_solve(F, b); x.block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    x = blr2_solve(F, b)
x.block_until_ready()
print(f"blr2 solve (8 rhs): {(time.perf_counter()-t0)/10*1e3:.1f}ms", flush=True)
