"""RGB hand-fitting golden-energy regression (reference:
tests/test_rgb_image_hand_fitting.py).

The reference records energies@iter49 between 2104.96 and 2132.93 across
backends/platforms; our trajectory lands inside that band.
"""

from examples.rgb_image_hand_fitting import run


def test_rgb_image_hand_fitting() -> None:
    energies = run(max_iter=50)
    # the reference's pytorch (true-gradient) goldens span
    # 2104.9656991756697 … 2132.9307950405196 across 9 platforms
    # (tests/test_rgb_image_hand_fitting.py:18-30). This trajectory is
    # genuinely chaotic: our own f64 CPU runs land at 2117.38-2122.39
    # across processes (XLA CPU reduction order varies), the same
    # amplification that forced the reference to record 9 platform
    # variants. Pin to the reference's recorded spread — any real gradient
    # regression moves E49 by hundreds (the depth fit, which is not
    # chaotic, is pinned at 1e-3 absolute instead).
    assert 2104.9 < energies[49] < 2133.0, energies[49]
