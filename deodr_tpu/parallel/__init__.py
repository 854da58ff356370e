"""Scale-out: device meshes, tile-sharded rendering, view-parallel fitting."""

from deodr_tpu.parallel.sharding import (
    make_device_mesh,
    make_textured_multiview_step,
    multiview_train_step,
    shard_render_scene,
)

__all__ = [
    "make_device_mesh",
    "make_textured_multiview_step",
    "multiview_train_step",
    "shard_render_scene",
]
