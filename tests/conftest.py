"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere, and keep x64 off to match TPU numerics.

Set unconditionally (not setdefault): the dev environment exports
JAX_PLATFORMS=axon, which must never leak into the test run.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon sitecustomize prepends "axon" to jax_platforms even when the
# env says cpu; the config update is authoritative after import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
