from audio_raytracer_tpu.runtime.registry import SceneRegistry
from audio_raytracer_tpu.runtime.orchestrator import AsyncRaytraceLoop

__all__ = ["SceneRegistry", "AsyncRaytraceLoop"]
