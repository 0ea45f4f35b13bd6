from audio_raytracer_tpu.parallel.mesh import make_mesh, pad_scene_for_prim_shards
from audio_raytracer_tpu.parallel.sharded import sharded_forward, make_sharded_forward

__all__ = [
    "make_mesh",
    "pad_scene_for_prim_shards",
    "sharded_forward",
    "make_sharded_forward",
]
