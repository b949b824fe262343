"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding is tested on an
emulated mesh — the TPU-build analog of the reference's
``mpiexec -np {1..4}`` CTest pattern, SURVEY.md §4) and with 64-bit enabled
for parity with the float64/complex128 reference.

Note: the environment's sitecustomize imports jax and pins
``JAX_PLATFORMS=axon`` (the single real TPU chip behind a relay) before any
test code runs, so the platform must be switched via ``jax.config.update``,
not env vars.  Tests must never touch the axon backend — the chip is a
single-client resource reserved for benchmarks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
