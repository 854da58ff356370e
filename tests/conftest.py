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

# persistent compilation cache: repeated test runs skip XLA recompilation.
# The directory is keyed by a host-CPU fingerprint: XLA:CPU AOT executables
# are machine-specific, but the loader LOADS mismatched entries anyway (with
# an error log: "could lead to execution errors such as SIGILL") — and a
# cache populated on a previous host with different CPU features was
# observed to produce WRONG NUMERICS here (the round-4 "check_vma changes
# view-sharded fitter gradients" divergence reproduced with the stale cache
# and vanished with a fresh compile of the identical program).
import hashlib as _hashlib


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:  # pragma: no cover - non-Linux hosts
        import platform

        flags = platform.platform()
    return _hashlib.sha256(flags.encode()).hexdigest()[:10]


_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache-" + _cpu_fingerprint())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
