"""Interactive camera controls: fly-cam, mouse-look, zoom — with the
reference's exact clamps and speed scaling.

Rebuilds src/state.rs:349-358 (set_fov / set_camera_angles) and
src/state.rs:411-441 (update_position: WASD/space/shift, dt- and fov-scaled)
plus the wheel/mouse handlers (src/dom.rs:34-40, 105-114) as pure functions
``CameraConfig -> CameraConfig``. The host engine applies them between frames,
mirroring the reference's command-queue pattern (handlers mutate state; the
next rAF tick consumes it).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from raytracer_tpu.camera.camera import (
    FOV_MAX,
    FOV_MIN,
    PITCH_LIMIT_DEG,
    CameraConfig,
    camera_front,
)
from raytracer_tpu.core import vec

# src/state.rs:9
MOVEMENT_SPEED = 0.001
# src/state.rs:142
LOOK_SENSITIVITY = 0.1
# src/dom.rs:37
WHEEL_ZOOM_STEP = 0.03


@dataclasses.dataclass
class KeydownMap:
    """Host-side input state (src/state.rs:15-28)."""

    w: bool = False
    a: bool = False
    s: bool = False
    d: bool = False
    space: bool = False
    shift: bool = False

    def all_false(self) -> bool:
        return not (self.w or self.a or self.s or self.d or self.space or self.shift)


def set_fov(cfg: CameraConfig, new_fov_radians) -> CameraConfig:
    """Clamp fov to (0.0001, 0.75π) (src/state.rs:349-352)."""
    return cfg.replace(
        fov=jnp.clip(jnp.asarray(new_fov_radians, jnp.float32), FOV_MIN, FOV_MAX)
    )


def zoom(cfg: CameraConfig, wheel_delta_sign: float) -> CameraConfig:
    """Scroll-wheel zoom: fov × (1 ± 0.03) (src/dom.rs:34-40)."""
    return set_fov(cfg, cfg.fov * (1.0 + WHEEL_ZOOM_STEP * wheel_delta_sign))


def set_camera_angles(cfg: CameraConfig, yaw, pitch) -> CameraConfig:
    """Pitch clamped to ±89° (src/state.rs:354-358)."""
    return cfg.replace(
        yaw=jnp.asarray(yaw, jnp.float32),
        pitch=jnp.clip(
            jnp.asarray(pitch, jnp.float32), -PITCH_LIMIT_DEG, PITCH_LIMIT_DEG
        ),
    )


def mouse_look(cfg: CameraConfig, dx: float, dy: float,
               look_sensitivity: float = LOOK_SENSITIVITY) -> CameraConfig:
    """Mouse-look: Δangle = movement × sensitivity × fov (src/dom.rs:105-114;
    dy is negated there because screen y grows downward)."""
    scale = look_sensitivity * cfg.fov
    return set_camera_angles(cfg, cfg.yaw + dx * scale, cfg.pitch - dy * scale)


def update_position(cfg: CameraConfig, keys: KeydownMap, dt_ms: float) -> CameraConfig:
    """Fly-cam integration (src/state.rs:411-441).

    Speed scales with dt and fov ("move slower when more zoomed in"); lateral
    motion uses cross(front, vup) *unnormalized*, exactly like the reference
    (src/state.rs:424, 430 — strafing slows as you pitch up/down, a quirk we
    preserve).
    """
    if keys.all_false():
        return cfg
    front = camera_front(cfg.yaw, cfg.pitch)
    right = vec.cross(front, cfg.vup)
    step = MOVEMENT_SPEED * dt_ms * cfg.fov
    origin = cfg.origin
    if keys.w:
        origin = origin + front * step
    if keys.a:
        origin = origin - right * step
    if keys.s:
        origin = origin - front * step
    if keys.d:
        origin = origin + right * step
    if keys.space:
        origin = origin + cfg.vup * step
    if keys.shift:
        origin = origin - cfg.vup * step
    return cfg.replace(origin=origin)
