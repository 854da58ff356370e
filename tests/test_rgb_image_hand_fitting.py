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
    # genuinely chaotic (heavy-ball-amplified), the same sensitivity that
    # forced the reference to record 9 platform variants. Pin BOTH bands:
    # the wide reference one, and a ±0.5% band around our own recorded
    # f64-CPU golden (3 consecutive fresh-process runs all landed on
    # 2117.377851527105 exactly, 2026-08; historical cross-process spread
    # without the compilation cache was 2117.38-2122.39, i.e. ±0.12%) —
    # regressions the 1.3%-wide reference band cannot see trip this one.
    assert 2104.9 < energies[49] < 2133.0, energies[49]
    golden = 2117.377851527105
    assert abs(energies[49] - golden) < 0.005 * golden, (energies[49], golden)
