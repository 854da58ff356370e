"""Repro: shard_map(check_vma=True) gradients miscompile under a
`jax.config.update("jax_platforms", ...)` override (jax 0.9.0).

The view-sharded multiframe fitter (deodr_tpu/mesh_fitter.py::
_make_energy_sharded) runs with ``check_vma=False`` because of this bug.
The one-line bisection this script automates:

- env JAX_PLATFORMS=cpu only           → sharded == sequential (checker ON)
- + jax.config.update("jax_platforms") → sharded trajectory diverges from
                                         iteration 1 (1469.50 vs 1512.12 on
                                         the 4-view octahedron fit), with
                                         ONLY the cpu backend initialized

With ``check_vma=False`` the trajectories match in both configurations —
that is the shipped workaround. A smaller repro (shard_map + lax.map +
render + psum, tools-local) does NOT trigger it; the full fitter energy
(silhouette flags, normals/lighting, has_aux value_and_grad, several psums)
is the smallest known trigger.

Run:   python tools/check_vma_repro.py             # expect DIVERGED on jax 0.9
       python tools/check_vma_repro.py --no-override   # expect MATCH
Exit code 1 when the divergence reproduces (so a fixed jax flips it to 0).
The in-tree expiry canary is
tests/test_parallel.py::test_check_vma_divergence_canary (strict xfail).
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if "--no-override" not in sys.argv:
    # THE trigger: the override that test environments need when a
    # sitecustomize has already imported jax before they can set the env var
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the checker ON in the fitter's shard_map call
_orig_shard_map = jax.shard_map


def _patched(f, **kw):
    if "check_vma" in kw:
        kw["check_vma"] = True
    return _orig_shard_map(f, **kw)


jax.shard_map = _patched

from jax.sharding import Mesh  # noqa: E402

from deodr_tpu.geometry.primitives import octahedron_mesh  # noqa: E402
from deodr_tpu.mesh_fitter import MeshRGBFitterWithPoseMultiFrame  # noqa: E402


def make_fitter(images, n_frames):
    base = octahedron_mesh(n_subdivision=1)
    f = MeshRGBFitterWithPoseMultiFrame(
        vertices=np.asarray(base.vertices),
        faces=np.asarray(base.faces),
        euler_init=np.zeros((n_frames, 3)),
        translation_init=np.zeros((n_frames, 3)),
        default_color=np.array([0.4, 0.3, 0.25]),
        default_light_directional=np.array([0.1, 0.5, 0.4]),
        default_light_ambient=0.6,
    )
    f.set_background_color(np.array([0.1, 0.2, 0.3]))
    f.set_images(images)
    return f


def main() -> int:
    n_frames, steps, h, w = 4, 2, 48, 64
    rng = np.random.RandomState(0)
    images = [np.clip(0.5 + 0.2 * rng.rand(h, w, 3), 0, 1) for _ in range(n_frames)]

    seq = make_fitter(images, n_frames)
    es = [seq.step()[0] for _ in range(steps)]

    par = make_fitter(images, n_frames)
    par.set_device_mesh(Mesh(np.array(jax.devices()[:4]), ("views",)))
    ep = [par.step()[0] for _ in range(steps)]

    rel = max(abs(a - b) / abs(a) for a, b in zip(es, ep))
    print("sequential:", es)
    print("sharded   :", ep)
    print("max rel diff:", rel)
    if rel > 1e-9:
        print("DIVERGED: shard_map(check_vma=True) gradients are wrong under the "
              "jax_platforms config override (known jax 0.9 bug)")
        return 1
    print("MATCH: the lowering bug is fixed — remove the check_vma=False "
          "workaround in deodr_tpu/mesh_fitter.py::_make_energy_sharded")
    return 0


if __name__ == "__main__":
    sys.exit(main())
