import os, sys, time
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS","") + " ").strip()
import jax
cache_dir = os.path.expanduser("~/.cache/htool_tpu_xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
import htool_tpu as ht
from htool_tpu.hmatrix.blr2 import build_blr2, blr2_lu, blr2_solve, blr2_matvec, blr2_backward_error
from htool_tpu.testing import create_sphere, laplace_kernel_symmetric

jnp.zeros(()).block_until_ready()
n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
coarse = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
eps = 1e-4
pts = create_sphere(n)
gen = ht.KernelGenerator(laplace_kernel_symmetric, pts.astype(np.float32), pts.astype(np.float32))
tree = ht.build_cluster_tree(pts, max_leaf_size=256)

for rnd in range(2):
    t0 = time.perf_counter()
    A = build_blr2(gen, tree, epsilon=eps, coarse_size=coarse, diag_mode="dense")
    A.pU.block_until_ready()
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    F = blr2_lu(A, error_estimate=False)
    (F.Dd if F.diag_mode=="dense" else F.pU).block_until_ready()
    t_lu = time.perf_counter() - t0
    t0 = time.perf_counter()
    be = blr2_backward_error(A, F, n_probe=2)
    t_be = time.perf_counter() - t0
    b = jnp.asarray(np.random.RandomState(1).randn(n, 8).astype(np.float32))
    x = blr2_solve(F, b); x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = blr2_solve(F, b)
    x.block_until_ready()
    t_solve = (time.perf_counter() - t0) / 10
    print(f"round{rnd}: n={n} nC={A.nC} P={A.P} R={A.R} failed={A.info['n_aca_failed']} "
          f"build={t_build:.2f}s lu={t_lu:.2f}s solve={t_solve*1e3:.1f}ms "
          f"backward_err={be:.2e} (probe {t_be:.2f}s) "
          f"compression={A.compression_info()['compression_ratio']:.1f}x", flush=True)
