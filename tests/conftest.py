"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single tunneled chip with high per-dispatch
latency; tests run on XLA's host platform instead, with 8 virtual devices so
multi-chip sharding paths are exercised.  The container's sitecustomize
registers the remote-TPU ("axon") platform in every interpreter, so we must
force the platform back to CPU via jax.config (env vars alone are too late).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# SLAM geometry needs real f32 matmuls, not bf16-reduced MXU passes.
jax.config.update("jax_default_matmul_precision", "highest")
