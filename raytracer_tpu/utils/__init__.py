"""Utilities: performance metrics and profiling helpers."""

from raytracer_tpu.utils.profiling import MraysMeter, mrays_per_sec

__all__ = ["MraysMeter", "mrays_per_sec"]
