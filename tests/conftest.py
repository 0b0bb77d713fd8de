"""Test harness config: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

The container's axon sitecustomize force-registers the TPU-tunnel platform
(and each eager op is an RPC over the tunnel), so tests must both set the
XLA flags before jax initializes *and* override jax_platforms afterwards.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
