"""Scene + camera presets: the reference demo scene and the BASELINE configs.

- :func:`demo_scene` is an exact rebuild of the reference's 9-sphere default
  scene (src/state.rs:148-257) with its default camera (src/state.rs:96-146).
- Configs 1-5 are the BASELINE.md benchmark scenes from Shirley's
  *Ray Tracing in One Weekend*, including the ~480-sphere final cover scene.
  Random scene generation uses a seeded numpy generator so every build is
  identical (the reference had no such scene; its ABI capped at 15 spheres,
  static/shader.frag:103).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from raytracer_tpu.camera.camera import CameraConfig
from raytracer_tpu.scene.materials import Material
from raytracer_tpu.scene.spheres import Scene, make_scene


def demo_scene() -> Scene:
    """The reference's default 9-sphere scene, verbatim (src/state.rs:148-257)."""
    d, m, g = Material.diffuse, Material.metal, Material.glass
    return make_scene(
        [
            ((0.0, -100.5, -1.0), 100.0, d((0.75, 0.6, 0.5))),  # ground
            ((0.0, 0.0, -1.0), 0.5, d((0.3, 0.3, 0.4))),  # center (blue)
            ((-1.1, 0.0, -1.0), 0.5, m((1.0, 1.0, 1.0))),  # left
            ((1.1, 0.0, -1.0), 0.5, g(1.5)),  # right
            ((-0.5, -0.35, -0.55), -0.15, m((1.0, 1.0, 1.0))),  # back left (shiny)
            ((-0.75, -0.4, -0.35), -0.1, m((1.0, 1.0, 1.0))),  # front left (fuzzy)
            ((0.0, 1.2, 4.0), 2.0, d((1.0, 0.8, 0.8))),  # behind
            ((150.0, 20.0, -500.0), 100.0, d((0.95, 0.95, 1.0))),  # moon
            ((170.0, -20.0, -350.0), 30.0, d((1.0, 1.0, 1.0))),  # moon's moon
        ]
    )


def demo_camera(width: int, height: int) -> CameraConfig:
    """The reference's default camera (src/state.rs:100-113): origin (0,0,1),
    yaw -90° (down -z), fov π/3, aperture 0, focus 0.75."""
    return CameraConfig.create(
        origin=(0.0, 0.0, 1.0),
        yaw=-90.0,
        pitch=0.0,
        fov=math.pi / 3.0,
        aperture=0.0,
        focus_distance=0.75,
        aspect_ratio=width / height,
    )


# --- BASELINE configs (Shirley, Ray Tracing in One Weekend) -----------------


def two_sphere_scene() -> Scene:
    """Config 1: diffuse sphere + ground (RTiOW ch. 8)."""
    d = Material.diffuse
    return make_scene(
        [
            ((0.0, 0.0, -1.0), 0.5, d((0.5, 0.5, 0.5))),
            ((0.0, -100.5, -1.0), 100.0, d((0.5, 0.5, 0.5))),
        ]
    )


def three_sphere_scene(hollow_glass: bool = True) -> Scene:
    """Config 2: Lambertian / dielectric / metal trio (RTiOW ch. 9-11).

    ``hollow_glass`` adds the negative-radius inner shell from ch. 11.
    """
    d, m, g = Material.diffuse, Material.metal, Material.glass
    spheres = [
        ((0.0, -100.5, -1.0), 100.0, d((0.8, 0.8, 0.0))),  # ground
        ((0.0, 0.0, -1.0), 0.5, d((0.1, 0.2, 0.5))),  # center
        ((-1.0, 0.0, -1.0), 0.5, g(1.5)),  # left (glass)
        ((1.0, 0.0, -1.0), 0.5, m((0.8, 0.6, 0.2), fuzz=0.0)),  # right
    ]
    if hollow_glass:
        spheres.append(((-1.0, 0.0, -1.0), -0.45, g(1.5)))
    return make_scene(spheres)


def simple_camera(width: int, height: int) -> CameraConfig:
    """Axis-aligned 90°-ish camera at the origin for configs 1-2.

    Expressed through the same yaw/pitch parameterization the reference uses
    (yaw=-90 looks down -z, src/state.rs:108-113)."""
    return CameraConfig.create(
        origin=(0.0, 0.0, 0.0),
        yaw=-90.0,
        pitch=0.0,
        fov=math.pi / 2.0,
        aperture=0.0,
        focus_distance=1.0,
        aspect_ratio=width / height,
    )


def dof_camera(width: int, height: int) -> CameraConfig:
    """Config 3: positionable camera with defocus blur (RTiOW ch. 12-13):
    lookfrom (3,3,2) → lookat (0,0,-1), fov 20°, aperture 2.0, focus = dist."""
    lookfrom = np.array([3.0, 3.0, 2.0])
    lookat = np.array([0.0, 0.0, -1.0])
    yaw, pitch = yaw_pitch_from_lookat(lookfrom, lookat)
    return CameraConfig.create(
        origin=tuple(lookfrom),
        yaw=yaw,
        pitch=pitch,
        fov=math.radians(20.0),
        aperture=2.0,
        focus_distance=float(np.linalg.norm(lookfrom - lookat)),
        aspect_ratio=width / height,
    )


def cover_scene(seed: int = 0) -> Scene:
    """Config 5: the RTiOW final cover scene — ~480 random small spheres,
    3 feature spheres, and the ground (RTiOW ch. 13.1). Deterministic."""
    rng = np.random.default_rng(seed)
    d, m, g = Material.diffuse, Material.metal, Material.glass
    spheres = [((0.0, -1000.0, 0.0), 1000.0, d((0.5, 0.5, 0.5)))]
    for a in range(-11, 11):
        for b in range(-11, 11):
            choose_mat = rng.random()
            center = (a + 0.9 * rng.random(), 0.2, b + 0.9 * rng.random())
            if np.linalg.norm(np.array(center) - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            if choose_mat < 0.8:
                albedo = tuple(rng.random(3) * rng.random(3))
                spheres.append((center, 0.2, d(albedo)))
            elif choose_mat < 0.95:
                albedo = tuple(rng.random(3) * 0.5 + 0.5)
                fuzz = float(rng.random() * 0.5)
                spheres.append((center, 0.2, m(albedo, fuzz=fuzz)))
            else:
                spheres.append((center, 0.2, g(1.5)))
    spheres.append(((0.0, 1.0, 0.0), 1.0, g(1.5)))
    spheres.append(((-4.0, 1.0, 0.0), 1.0, d((0.4, 0.2, 0.1))))
    spheres.append(((4.0, 1.0, 0.0), 1.0, m((0.7, 0.6, 0.5), fuzz=0.0)))
    return make_scene(spheres)


def cover_camera(width: int, height: int) -> CameraConfig:
    """Cover-scene camera (RTiOW ch. 13.1): lookfrom (13,2,3) → (0,0,0),
    fov 20°, aperture 0.1, focus 10."""
    lookfrom = np.array([13.0, 2.0, 3.0])
    lookat = np.array([0.0, 0.0, 0.0])
    yaw, pitch = yaw_pitch_from_lookat(lookfrom, lookat)
    return CameraConfig.create(
        origin=tuple(lookfrom),
        yaw=yaw,
        pitch=pitch,
        fov=math.radians(20.0),
        aperture=0.1,
        focus_distance=10.0,
        aspect_ratio=width / height,
    )


def yaw_pitch_from_lookat(lookfrom, lookat) -> Tuple[float, float]:
    """Invert the reference's yaw/pitch→front mapping (src/state.rs:109-113):
    front = (cos(yaw)cos(pitch), sin(pitch), sin(yaw)cos(pitch)), degrees."""
    front = np.asarray(lookat, dtype=np.float64) - np.asarray(lookfrom, dtype=np.float64)
    front = front / np.linalg.norm(front)
    pitch = math.degrees(math.asin(np.clip(front[1], -1.0, 1.0)))
    yaw = math.degrees(math.atan2(front[2], front[0]))
    return yaw, pitch


#: name → (scene builder, camera builder, default W, H, spp, depth)
BASELINE_CONFIGS = {
    "two_sphere": (two_sphere_scene, simple_camera, 400, 225, 16, 8),
    "three_sphere": (three_sphere_scene, simple_camera, 1280, 720, 64, 16),
    "dof": (three_sphere_scene, dof_camera, 1920, 1080, 128, 16),
    "progressive": (demo_scene, demo_camera, 1920, 1080, 1, 8),
    "cover": (cover_scene, cover_camera, 1200, 800, 500, 50),
    "demo": (demo_scene, demo_camera, 1280, 720, 1, 8),
}


def get_config(name: str, width: int | None = None, height: int | None = None):
    """Resolve a named BASELINE config → (scene, camera, w, h, spp, depth)."""
    scene_fn, cam_fn, w, h, spp, depth = BASELINE_CONFIGS[name]
    w = width or w
    h = height or h
    return scene_fn(), cam_fn(w, h), w, h, spp, depth
