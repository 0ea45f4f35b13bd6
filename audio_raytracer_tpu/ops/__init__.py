from audio_raytracer_tpu.ops.fibonacci import fibonacci_directions
from audio_raytracer_tpu.ops import quaternion
from audio_raytracer_tpu.ops import intersect

__all__ = ["fibonacci_directions", "quaternion", "intersect"]
