"""Test configuration: force CPU with a virtual 8-device mesh and float64.

Tests run on CPU so they are reproducible anywhere; float64 is enabled so
golden numbers can be compared against the reference's double-precision
outputs at tight tolerances. Multi-device sharding tests use the virtual
8-device CPU mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
