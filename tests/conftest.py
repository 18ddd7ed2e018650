"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so sharding code paths
(dp/fsdp/tp/sp over a jax.sharding.Mesh) are exercised without TPU
hardware, mirroring how the driver dry-runs ``dryrun_multichip``.

The container's sitecustomize registers the tunneled-TPU ("axon") PJRT
plugin and pins ``jax.config.jax_platforms = "axon,cpu"`` — overriding
the JAX_PLATFORMS env var — so we must override via jax.config *after*
importing jax, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.default_backend() == "cpu", jax.default_backend()
