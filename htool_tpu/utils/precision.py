"""Full-precision matmul policy for the compute path.

TPU MXUs execute f32 ``dot_general`` at bf16 input precision by default
(~3 decimal digits), which breaks the library's accuracy contract — the
reference computes in full f64 BLAS (``wrappers/wrapper_blas.hpp:24-42``)
and its acceptance tests require relative Frobenius error < ε
(``tests/functional_tests/hmatrix/test_hmatrix_build.hpp:191``).  Measured
here: a two-level LU whose backward error is 1e-7 in f32 on CPU lands at
1.7e-3 on the chip under default precision.

``precise_jit`` is a drop-in for :func:`jax.jit` that traces its function
under ``jax.default_matmul_precision('highest')`` (full f32 accumulation
via multi-pass bf16 on the MXU).  The Pallas kernels set
``Precision.HIGHEST`` explicitly (``ops/tiled_matvec.py:273``); this
covers the XLA paths.  ``full_precision()`` is the bare context manager
for eager (non-jitted) compute sections.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["precise_jit", "full_precision"]


def full_precision():
    """Context manager: full-f32 matmul precision for eager sections."""
    return jax.default_matmul_precision("highest")


def precise_jit(fn=None, **jit_kwargs):
    """``jax.jit`` that traces under full matmul precision.

    Usable bare (``@precise_jit``) or with jit keywords
    (``@precise_jit(static_argnames=...)`` / via ``functools.partial``)."""
    if fn is None:
        return lambda f: precise_jit(f, **jit_kwargs)

    @functools.wraps(fn)
    def _traced(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return jax.jit(_traced, **jit_kwargs)
