"""Torch autograd bridge: forward matches the JAX render and gradients
flow into torch tensors (reference analog:
deodr/pytorch/differentiable_renderer_pytorch.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_torch_bridge_forward_and_grad():
    from deodr_tpu.interop.torch_bridge import render_scene_torch
    from examples.triangle_soup_fitting import create_example_scene

    np.random.seed(11)
    scene2d = create_example_scene(n_tri=5, width=48, height=48)
    base = scene2d._buffers(*scene2d._diff_inputs())

    ij = torch.tensor(np.asarray(base.ij), requires_grad=True)
    colors = torch.tensor(np.asarray(base.colors), requires_grad=True)
    uv = torch.tensor(np.asarray(base.uv), requires_grad=True)
    shade = torch.tensor(np.asarray(base.shade), requires_grad=True)
    texture = torch.tensor(np.asarray(base.texture), requires_grad=True)

    image = render_scene_torch(base, 1.0, ij, colors, uv, shade, texture, aa_edge_capacity=15)
    assert image.shape == (48, 48, 3)
    loss = (image**2).sum()
    loss.backward()
    assert ij.grad is not None and np.isfinite(ij.grad.numpy()).all()
    assert colors.grad is not None and float(colors.grad.abs().sum()) > 0
    assert texture.grad is not None
