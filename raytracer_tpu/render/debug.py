"""Debug AOV (arbitrary output variable) render modes.

The reference's in-shader debug channel (static/shader.frag:306-318) paints
a cursor marker and a selection outline into the beauty render. We keep
that (TraceOptions.enable_debug) and add first-class AOV renders the
reference lacked — the standard renderer-debugging views:

- 'normal': first-hit shading normal mapped to [0,1]^3
- 'depth':  first-hit distance (normalized by |d|), 1/(1+t) tonemapped
- 'uuid':   first-hit sphere index hashed to a color (id map)
- 'front':  front-face (green) vs back-face (red) — surfaces seen from
            inside, e.g. hollow glass shells

All AOVs reuse the SAME hit kernel as the beauty render (hit_world), so
what you debug is what you render.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytracer_tpu.camera.camera import CameraConfig, derive_camera, pixel_st_grid, generate_rays
from raytracer_tpu.core import vec
from raytracer_tpu.render.tracer import hit_world
from raytracer_tpu.scene.spheres import Scene

AOV_MODES = ("normal", "depth", "uuid", "front")


def render_aov(
    scene: Scene,
    camera: CameraConfig,
    width: int,
    height: int,
    mode: str = "normal",
    key=None,
):
    """Single-bounce AOV render, (H, W, 3) f32 in [0,1] (GL row order)."""
    if mode not in AOV_MODES:
        raise ValueError(f"unknown AOV mode {mode!r}; choose from {AOV_MODES}")
    if key is None:
        key = jax.random.PRNGKey(0)
    return _render_aov_jit(scene, derive_camera(camera), width, height, mode, key)


def _uuid_color(uuid):
    """Hash an id to a stable, distinguishable color."""
    u = uuid.astype(jnp.uint32) + 1
    def h(mult):
        x = u * jnp.uint32(mult)
        x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
        x = x ^ (x >> 12)
        return ((x & 0xFF).astype(jnp.float32)) / 255.0
    return jnp.stack([h(0x9E3779B1), h(0x85EBCA6B), h(0xC2B2AE35)], axis=-1)


@functools.partial(jax.jit, static_argnames=("width", "height", "mode"))
def _render_aov_jit(scene, dcam, width: int, height: int, mode: str, key):
    st = pixel_st_grid(width, height).reshape(-1, 2)
    # PINHOLE primaries: zero the lens radius so id/depth/normal maps are
    # deterministic per pixel — with aperture > 0, a random thin-lens
    # offset would scramble AOVs exactly at the object boundaries being
    # debugged (measured 4% differing uuid pixels on the dof config)
    dcam = dcam.replace(lens_radius=jnp.zeros_like(dcam.lens_radius))
    ray = generate_rays(dcam, st, key, width, height, jitter=False)
    rec = hit_world(ray.origin, ray.direction, scene)
    hit3 = rec.hit[..., None]
    if mode == "normal":
        img = jnp.where(hit3, rec.normal * 0.5 + 0.5, 0.0)
    elif mode == "depth":
        # t is in units of |d|; normalize to world distance, then 1/(1+t)
        t_world = rec.t * vec.length(ray.direction)
        shade = 1.0 / (1.0 + t_world)
        img = jnp.where(hit3, shade[..., None] * jnp.ones((1, 3)), 0.0)
    elif mode == "uuid":
        img = jnp.where(hit3, _uuid_color(rec.uuid), 0.0)
    else:  # 'front'
        green = jnp.array([0.1, 0.9, 0.1], jnp.float32)
        red = jnp.array([0.9, 0.1, 0.1], jnp.float32)
        img = jnp.where(
            hit3, jnp.where(rec.front_face[..., None], green, red), 0.0
        )
    return img.reshape(height, width, 3)
