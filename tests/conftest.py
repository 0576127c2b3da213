"""Test config: force an 8-device virtual CPU mesh so data-parallel and
sharding logic is testable without TPU hardware."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from n2nmn_tpu.parallel.platform import force_cpu_devices  # noqa: E402

force_cpu_devices(8)

import jax  # noqa: E402

# TPU-default matmul precision is reduced (bf16-ish accumulation inputs);
# numerical comparisons need exact f32.
jax.config.update("jax_default_matmul_precision", "highest")
