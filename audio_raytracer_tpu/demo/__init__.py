from audio_raytracer_tpu.demo.scene_format import load_scene_file, build_registry
from audio_raytracer_tpu.demo.sample_scene import sample_scene_dict

__all__ = ["load_scene_file", "build_registry", "sample_scene_dict"]
