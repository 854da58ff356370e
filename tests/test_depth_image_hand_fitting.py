"""Depth hand-fitting golden-energy regression (reference:
tests/test_depth_image_hand_fitting.py).

The reference pins energy@iter49 per backend/platform; our jax.grad
gradients match the reference's *pytorch autograd* trajectory to ~1e-7
(the numpy backend's hand-written adjoint differs from true gradients at
~1e-5). We assert against the pytorch golden with a tolerance covering the
reference's own cross-platform spread.
"""

from examples.depth_image_hand_fitting import run


def test_depth_image_hand_fitting() -> None:
    energies = run(max_iter=50)
    # reference pytorch golden 251.31652686512888 (the true-gradient
    # trajectory; reference tests/test_depth_image_hand_fitting.py:18-24);
    # this suite's f64 CPU run lands at 251.3165034772 — 9e-8 relative.
    # Pin at 1e-3 absolute (4e-6 relative), ~40x the observed gap and far
    # inside the reference's own cross-platform spread.
    assert abs(energies[49] - 251.31652686512888) < 1e-3, energies[49]
    # the numpy backend's hand-written adjoint differs from true gradients
    # at ~1e-5, so its golden sits slightly off; stay within its spread too
    assert abs(energies[49] - 251.32711113732933) < 0.05, energies[49]
