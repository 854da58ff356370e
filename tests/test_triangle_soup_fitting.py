"""Triangle-soup fitting across the reference's 4 test configurations
(clockwise × antialiase_error), mirroring the reference's
tests/test_triangle_soup_fitting.py. The reference pins platform-specific
bit-exact final losses; float32/float64 TPU trajectories can't be bit-pinned,
so these assert strong convergence (the reference's recorded goldens reach
~4% of the initial loss after 500 iterations; with identical hyperparameters
this implementation converges at least as fast — see README parity notes).
"""

import pytest

from examples.triangle_soup_fitting import run


@pytest.mark.parametrize("clockwise", [False, True])
@pytest.mark.parametrize("antialiase_error", [False, True])
def test_triangle_soup_fitting_converges(clockwise, antialiase_error):
    losses, final_image = run(nb_max_iter=60, clockwise=clockwise, antialiase_error=antialiase_error)
    assert losses[0] > 0
    # with the reference's exact hyperparameters the loss must fall fast:
    # 60 iterations cut it to roughly a quarter of the start (the reference's
    # own 500-iteration goldens land at ~1330 for this scene scale)
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])
    assert final_image is not None and final_image.shape[2] == 3
