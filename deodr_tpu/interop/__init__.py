"""Interop bridges to other autodiff frameworks."""

from deodr_tpu.interop.torch_bridge import render_scene_torch

__all__ = ["render_scene_torch", "CameraTorch", "Scene3DTorch"]


def __getattr__(name):
    # torch_scene imports torch lazily; keep `import deodr_tpu` torch-free
    if name in ("CameraTorch", "Scene3DTorch"):
        from deodr_tpu.interop import torch_scene

        return getattr(torch_scene, name)
    raise AttributeError(name)
