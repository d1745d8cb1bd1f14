"""Scene layer: struct-of-arrays sphere scenes, materials, and preset builders.

Replaces both of the reference's scene representations — the host-side
``Vec<Sphere>`` (src/glsl.rs:35-40) and the device-side ``Sphere[15]`` uniform
array with its hardcoded 15-slot cap (static/shader.frag:103,
src/webgl.rs:225-274) — with a single SoA pytree whose sphere count is a
static shape, not a cap.
"""

from raytracer_tpu.scene.materials import DIFFUSE, METAL, GLASS, Material
from raytracer_tpu.scene.spheres import Scene, make_scene

__all__ = ["DIFFUSE", "METAL", "GLASS", "Material", "Scene", "make_scene"]
