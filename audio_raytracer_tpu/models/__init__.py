from audio_raytracer_tpu.models.raytracer import (
    forward,
    make_forward,
    random_scene,
)

__all__ = ["forward", "make_forward", "random_scene"]
