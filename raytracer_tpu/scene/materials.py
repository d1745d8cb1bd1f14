"""Material model: Lambertian diffuse, fuzzy metal, dielectric glass.

Material type codes match the reference ABI exactly
(static/shader.frag:44-47, src/glsl.rs:16-24): DIFFUSE=0, METAL=1, GLASS=2.
Any other code is treated as "absorb" (static/shader.frag:284-285).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

DIFFUSE = 0
METAL = 1
GLASS = 2

MATERIAL_NAMES = {DIFFUSE: "diffuse", METAL: "metal", GLASS: "glass"}


@dataclasses.dataclass(frozen=True)
class Material:
    """Host-side material description (mirror of src/glsl.rs:27-32).

    Used only while *building* scenes; at trace time materials live as SoA
    arrays inside :class:`raytracer_tpu.scene.spheres.Scene`.
    """

    material_type: int
    albedo: Tuple[float, float, float]
    fuzz: float = 0.0
    refraction_index: float = 0.0

    @staticmethod
    def diffuse(albedo: Tuple[float, float, float]) -> "Material":
        return Material(DIFFUSE, albedo)

    @staticmethod
    def metal(albedo: Tuple[float, float, float], fuzz: float = 0.0) -> "Material":
        return Material(METAL, albedo, fuzz=fuzz)

    @staticmethod
    def glass(
        refraction_index: float = 1.5,
        albedo: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    ) -> "Material":
        return Material(GLASS, albedo, refraction_index=refraction_index)
