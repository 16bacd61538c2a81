"""Test env: force an 8-device virtual CPU mesh.

This is the multi-device test strategy from SURVEY §4: real TPU slices are
not needed — shardings are validated on a host-platform device mesh.

Note: the environment's sitecustomize pre-imports jax (TPU tunnel), so env
vars alone are too late; jax.config.update still wins because backends only
initialize on first use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # The suite is compile-bound on its one CPU core (tiny models, many
    # distinct jit programs); O0 halves compile time for the heavy modules
    # and every numerical-parity tolerance still holds (measured 2026-08-19:
    # stage1_multichip+beam 80s -> 42s, parity modules all green). Real-TPU
    # benches/verify run without this override.
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
