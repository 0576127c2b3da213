"""Test config: force an 8-device virtual CPU mesh so data-parallel and
sharding logic is testable without TPU hardware."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This image's sitecustomize forces the axon TPU platform regardless of
# JAX_PLATFORMS env; override via jax.config so tests run on the 8-device
# virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
# TPU-default matmul precision is reduced (bf16-ish accumulation inputs);
# numerical comparisons need exact f32.
jax.config.update("jax_default_matmul_precision", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
