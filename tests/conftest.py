"""Test configuration: force CPU with a virtual 8-device mesh and float64.

Tests run on CPU so they are reproducible anywhere; float64 is enabled so
golden numbers can be compared against the reference's double-precision
outputs at tight tolerances. Multi-device sharding tests use the virtual
8-device CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pre-register an accelerator platform (e.g. a tunneled
# TPU) via sitecustomize and force it in jax_platforms; tests must run on the
# host CPU for reproducibility, so select it explicitly after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeated test runs skip XLA recompilation
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
