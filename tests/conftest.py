"""Test config: force an 8-device virtual CPU mesh so data-parallel and
sharding logic is testable without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# This CPU backend dispatches batched f32 GEMMs to a reduced-precision
# fast path (~1e-2 abs error); force exact f32 for numerical tests.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
