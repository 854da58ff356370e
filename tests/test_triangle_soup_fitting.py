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


# the reference's recorded 500-iteration finals per config (windows /
# colab agree to ~0.3%): tests/test_triangle_soup_fitting.py:29-107
_REF_FINAL = {False: 1331.3578738815468, True: 1457.8585914203582}
# this suite's f64 CPU finals (true jax.grad gradients converge ~2.5x
# deeper than the reference's hand-written adjoint, which carries two
# documented bugs — see tests/test_ref_grad_differential.py)
_OUR_FINAL = {
    (False, False): 473.293523,
    (False, True): 607.599781,
    (True, False): 473.293523,
    (True, True): 607.626059,
}


@pytest.mark.slow
@pytest.mark.parametrize("clockwise", [False, True])
@pytest.mark.parametrize("antialiase_error", [False, True])
def test_triangle_soup_fitting_500_iters_beats_reference(clockwise, antialiase_error):
    """Full-length comparison against the reference's recorded goldens:
    after the same 500 iterations with identical hyperparameters, our final
    loss must be at least as low as the reference's recorded final for the
    same config, and must reproduce this suite's own golden within 1%."""
    losses, _ = run(nb_max_iter=500, clockwise=clockwise, antialiase_error=antialiase_error)
    final = float(losses[-1])
    ref = _REF_FINAL[antialiase_error]
    ours = _OUR_FINAL[(clockwise, antialiase_error)]
    assert final <= ref, f"converged to {final}, reference reached {ref}"
    assert abs(final - ours) < 0.01 * ours, f"{final} vs recorded {ours}"
