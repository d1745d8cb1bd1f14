"""Camera layer: config pytree, derived basis, ray generation, fly-cam controller.

Rebuilds the camera half of the reference's ``State`` (src/state.rs:31-94)
and its ``update_pipeline`` derivation (src/state.rs:319-347) as pure
functions over pytrees.
"""

from raytracer_tpu.camera.camera import (
    CameraConfig,
    DerivedCamera,
    derive_camera,
    generate_rays,
    center_ray,
)
from raytracer_tpu.camera import controller

__all__ = [
    "CameraConfig",
    "DerivedCamera",
    "derive_camera",
    "generate_rays",
    "center_ray",
    "controller",
]
