"""Differential tests against the reference C renderer's golden images.

- The triangle-soup ground-truth scene is reconstructed with the exact same
  RNG sequence as the reference and verified by sha256 (reference:
  tests/test_render_mesh.py:31-53); our render must match the reference C
  core's stored PNG within quantization (reference criterion: ≤ 1/255,
  tests/test_render_mesh.py:60-64).
- The duck mesh render must match the reference's golden PNG (reference:
  tests/test_render_mesh.py:20-27; tolerance relaxed from bit-exact to
  a small pixel budget since we do not replicate float64 scanline order
  bit-for-bit).
"""

import hashlib
import os

import numpy as np
import PIL.Image

import deodr_tpu
from examples.triangle_soup_fitting import create_example_scene
from examples.render_mesh import example_rgb


def test_triangle_soup_scene_and_render_match_reference() -> None:
    np.random.seed(2)
    scene_gt = create_example_scene(clockwise=True)

    assert (
        hashlib.sha256(scene_gt.ij.tobytes()).hexdigest()
        == "56a498bf243bd514c9ab4a3bfd90f8105aa2c168023fa288dc39ad82e2d36a20"
    )
    assert (
        hashlib.sha256(scene_gt.depths.tobytes()).hexdigest()
        == "e25eed6310fef37e401aef594c4c95e1b3cccf962a3646976cf546c58ddfac0a"
    )
    assert (
        hashlib.sha256(scene_gt.uv.tobytes()).hexdigest()
        == "f436623445124ecff7139efa57cce21c2768e23727bac974e236ea33651cc7c9"
    )
    assert (
        hashlib.sha256(scene_gt.shade.tobytes()).hexdigest()
        == "4b796b925c4349245e52a3e6311e99d536dc71e8aa8dc43cbd67cbe35d48892f"
    )
    assert (
        hashlib.sha256(scene_gt.colors.tobytes()).hexdigest()
        == "76dbff728be3eb0860bd27adf493e935dbd81cd7232ec732ba30c4f73ea35c94"
    )

    image, _ = scene_gt.render(sigma=1)
    golden = np.asarray(
        PIL.Image.open(os.path.join(os.path.dirname(__file__), "data", "triangle_soup.png"))
    ).astype(np.float64)
    assert np.max(np.abs(golden - image * 255)) <= 1


def test_render_mesh_duck() -> None:
    image = example_rgb(display=False, save_image=False, width=320, height=240)
    golden = np.asarray(
        PIL.Image.open(os.path.join(deodr_tpu.data_path, "test", "duck.png"))
    ).astype(np.int64)
    image_uint8 = (image * 255).astype(np.uint8).astype(np.int64)
    diff = np.abs(golden - image_uint8).max(axis=-1)
    # measured: ZERO pixels deviate by >= 1/255 on this suite's f64 CPU
    # configuration — matching the reference's own bit-exact-after-
    # quantization criterion (reference: tests/test_render_mesh.py:20-27).
    # Pin with a 3-pixel budget at 1/255 (the reference grants its GL
    # oracle 3 pixels at 15/255, deodr/examples/render_mesh.py:149) and
    # absolutely none at >= 2/255.
    assert (diff >= 1).sum() <= 3, f"{(diff >= 1).sum()} pixels deviate by >=1/255"
    assert (diff >= 2).sum() == 0, f"max deviation {diff.max()}"
