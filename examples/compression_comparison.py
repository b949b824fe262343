#!/usr/bin/env python
"""Compressor comparison (examples/compression_comparison.cpp:60-100
analog): SVD vs fullACA vs partialACA error-vs-rank curves on a kernel
block between two clouds at increasing distance."""

import os
import csv
import jax.numpy as jnp
import numpy as np

import htool_tpu as ht
from htool_tpu.hmatrix.aca import batched_partial_aca
from htool_tpu.hmatrix.compressors import batched_full_aca, batched_svd_compress
from htool_tpu.testing import create_sphere, laplace_kernel


def main(outdir=".", m=500, n=100, max_rank=50):
    tp = create_sphere(m, radius=1.0, seed=0)
    sp = create_sphere(n, radius=1.0, center=(0.0, 0.0, 3.0), seed=1)
    gen = ht.KernelGenerator(laplace_kernel, tp, sp)
    A = np.asarray(gen.to_dense())
    normA = np.linalg.norm(A)

    rows = jnp.arange(m, dtype=jnp.int32)[None]
    cols = jnp.arange(n, dtype=jnp.int32)[None]
    tsz = jnp.asarray([m], jnp.int32)
    ssz = jnp.asarray([n], jnp.int32)

    out_rows = []
    for name, fn in [
        ("partialACA", batched_partial_aca),
        ("fullACA", batched_full_aca),
        ("SVD", batched_svd_compress),
    ]:
        for rank in range(1, max_rank + 1):
            U, V, rk, failed = fn(gen, rows, cols, tsz, ssz, 1e-16, rank, rank)
            err = np.linalg.norm(np.asarray(U[0] @ V[0]) - A) / normA
            out_rows.append(dict(compressor=name, rank=rank, error=err))
        print(f"{name}: rank {max_rank} error {out_rows[-1]['error']:.3e}")

    path = os.path.join(outdir, "compression_comparison.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["compressor", "rank", "error"])
        w.writeheader()
        w.writerows(out_rows)
    print("saved:", path)
    print("plot with: python tools/plot_comparison_compression.py", path)


if __name__ == "__main__":
    main()
