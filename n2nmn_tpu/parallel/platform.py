"""Single source of truth for forcing the virtual CPU mesh.

This image's sitecustomize pins ``jax_platforms=axon,cpu`` (one real TPU)
and IGNORES the ``JAX_PLATFORMS`` env var; the only reliable override is
``jax.config.update("jax_platforms", "cpu")`` before first device use.
Used by tests/conftest.py, __graft_entry__.py, and any CLI that needs the
n-device virtual CPU mesh (``--xla_force_host_platform_device_count``).
"""

import os


def force_cpu_devices(n_devices: int = 8) -> None:
    """Force JAX onto ``n_devices`` virtual CPU devices.

    Must run before JAX initializes a backend. Sets the XLA host-device-count
    flag if absent and unconditionally retargets the platform to cpu (the
    config update is the load-bearing part: the env var alone is ignored by
    this image's sitecustomize, and XLA_FLAGS may already carry the
    device-count flag when re-exec'd from a parent process).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
