"""PyTorch autograd bridge.

The reference packages its C renderer as a torch custom Function so the 2.5D
scene rasterization composes with torch autograd (reference:
deodr/pytorch/differentiable_renderer_pytorch.py:41-81). Here the same
shape: a ``torch.autograd.Function`` whose forward runs the JAX renderer and
whose backward runs its VJP — so torch users can drop this renderer into a
torch optimization loop. Unlike the reference bridge (which only
differentiates ``ij`` and ``colors``), gradients flow for ij, colors, uv,
shade and texture.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def render_scene_torch(scene_buffers, sigma: float, ij, colors, uv, shade, texture, aa_edge_capacity=None):
    """Differentiable (w.r.t. the five tensor args) torch rendering op.

    ``scene_buffers`` is a template :class:`deodr_tpu.ops.render.SceneBuffers`
    whose differentiable fields are replaced by the torch tensors.
    Returns a torch tensor image (H, W, C).
    """
    import torch
    import jax
    import jax.numpy as jnp

    from deodr_tpu.ops.render import render_scene_jit

    class _Render(torch.autograd.Function):
        @staticmethod
        def forward(ctx, ij_t, colors_t, uv_t, shade_t, texture_t):
            tensors = (ij_t, colors_t, uv_t, shade_t, texture_t)
            args = [None if t is None else jnp.asarray(t.detach().cpu().numpy()) for t in tensors]
            ctx.jax_args = args
            # remember each input's device so backward can hand autograd
            # gradients on the SAME device (CUDA-resident inputs otherwise
            # fail inside autograd's accumulation, not here)
            ctx.devices = [None if t is None else t.device for t in tensors]
            b = dataclasses.replace(
                scene_buffers,
                ij=args[0],
                colors=args[1],
                uv=args[2] if args[2] is not None else scene_buffers.uv,
                shade=args[3] if args[3] is not None else scene_buffers.shade,
                texture=args[4] if args[4] is not None else scene_buffers.texture,
            )
            ctx.buffers = b
            image, _, _ = render_scene_jit(b, float(sigma), aa_edge_capacity=aa_edge_capacity)
            return torch.from_numpy(np.asarray(image)).to(ij_t.device)

        @staticmethod
        def backward(ctx, grad_image):
            b = ctx.buffers

            def f(ij_a, colors_a, uv_a, shade_a, texture_a):
                bb = dataclasses.replace(b, ij=ij_a, colors=colors_a, uv=uv_a, shade=shade_a, texture=texture_a)
                image, _, _ = render_scene_jit(bb, float(sigma), aa_edge_capacity=aa_edge_capacity)
                return image

            _, vjp = jax.vjp(f, b.ij, b.colors, b.uv, b.shade, b.texture)
            g = vjp(jnp.asarray(grad_image.detach().cpu().numpy()))
            out = []
            for t, gi, dev in zip(ctx.jax_args, g, ctx.devices):
                out.append(None if (t is None or gi is None) else torch.from_numpy(np.asarray(gi)).to(dev))
            return tuple(out)

    return _Render.apply(ij, colors, uv, shade, texture)
