"""Complex-safe host<->device transfer and array-creation shims.

Some TPU runtimes (the axon single-chip relay used for benching among
them) do not implement complex64 host<->device transfers: an eager
``device_put`` of a complex array, an eager ``jnp.zeros(..., complex64)``
(which dispatches a broadcast of a host complex scalar), and a
``np.asarray(device_complex)`` fetch all fail with
``UNIMPLEMENTED: TPU backend error`` — and the first failure poisons every
later transfer in the process.  On-device complex arithmetic and complex
constants embedded in *compiled* programs work fine.

These shims keep complex data off the transfer boundary by moving the
real/imaginary planes separately (two float transfers) and forming the
complex array inside a compiled program (``lax.complex``).  They are
no-overhead pass-throughs for real dtypes and safe on every backend, so
the package uses them unconditionally on eager paths.

The reference framework has first-class complex support throughout
(``misc/misc.hpp:9-45`` type traits; complex kernels
``testing/generator_test.hpp:163-205``) — this module is what makes that
parity hold on TPU runtimes with the transfer gap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["czeros", "cfull", "ceye", "to_device", "to_host"]


def _is_complex_dtype(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


@partial(jax.jit, static_argnums=(0, 1))
def _zeros_jit(shape, dtype):
    return jnp.zeros(shape, dtype)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _full_jit(shape, dtype, fill):
    return jnp.full(shape, fill, dtype)


@partial(jax.jit, static_argnums=(0, 1))
def _eye_jit(n, dtype):
    return jnp.eye(n, dtype=dtype)


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def czeros(shape, dtype):
    """``jnp.zeros`` that never puts a host complex scalar on the device.

    Safe under an outer jit trace as well (composes as an inlined call)."""
    if _is_complex_dtype(dtype):
        return _zeros_jit(tuple(shape), jnp.dtype(dtype).name)
    return jnp.zeros(shape, dtype)


def cfull(shape, fill, dtype):
    if _is_complex_dtype(dtype):
        return _full_jit(tuple(shape), jnp.dtype(dtype).name, complex(fill))
    return jnp.full(shape, fill, dtype)


def ceye(n, dtype):
    if _is_complex_dtype(dtype):
        return _eye_jit(int(n), jnp.dtype(dtype).name)
    return jnp.eye(n, dtype=dtype)


def to_device(x, dtype=None):
    """``jnp.asarray`` that transfers complex input as two float planes.

    Tracers (callers running under an outer jit) pass straight through."""
    if isinstance(x, (jax.Array, jax.core.Tracer)):
        return x if dtype is None else x.astype(dtype)
    x = np.asarray(x)
    tgt = jnp.dtype(dtype) if dtype is not None else None
    if np.issubdtype(x.dtype, np.complexfloating) or (
        tgt is not None and _is_complex_dtype(tgt)
    ):
        ct = tgt if tgt is not None and _is_complex_dtype(tgt) else jnp.dtype(
            jnp.complex64 if x.dtype.itemsize <= 8 else jnp.complex128
        )
        rt = jnp.float32 if ct == jnp.dtype(jnp.complex64) else jnp.float64
        xc = np.asarray(x, np.complex128)
        re = jnp.asarray(np.ascontiguousarray(xc.real), rt)
        im = jnp.asarray(np.ascontiguousarray(xc.imag), rt)
        return _combine(re, im)
    return jnp.asarray(x, dtype)


def to_host(x):
    """``np.asarray`` that fetches complex arrays as two float planes."""
    if isinstance(x, jax.Array) and _is_complex_dtype(x.dtype):
        re, im = _split(x)
        out = np.asarray(re).astype(
            np.complex64 if x.dtype == jnp.dtype(jnp.complex64) else np.complex128
        )
        out.imag = np.asarray(im)
        return out
    return np.asarray(x)
