"""Unified render entry point: one signature, two backends.

``render_image(scene, camera_config, ...)`` dispatches to the plain-jnp
tracer or the Pallas TPU megakernel. 'auto' picks Pallas on TPU and jnp
elsewhere (the CPU test backend runs Pallas only in interpret mode, which is
for kernel tests, not rendering).
"""

from __future__ import annotations

import functools

import jax

from raytracer_tpu.camera.camera import CameraConfig, derive_camera
from raytracer_tpu.render.options import DebugParams, TraceOptions
from raytracer_tpu.render.tracer import render_image_jnp
from raytracer_tpu.scene.spheres import Scene


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=32)
def _jitted_jnp(width: int, height: int, spp: int, opts: TraceOptions,
                return_stats: bool, with_debug: bool):
    """One fully-jitted offline render per static config — a single device
    program instead of thousands of eager dispatches (critical when the
    device sits behind a network tunnel)."""

    def fn(scene, dcam, key, debug):
        return render_image_jnp(
            scene, dcam, width, height, spp, key, opts,
            debug if with_debug else None, return_stats=return_stats,
        )

    return jax.jit(fn)


def render_image(
    scene: Scene,
    camera: CameraConfig,
    width: int,
    height: int,
    spp: int,
    key,
    opts: TraceOptions | None = None,
    debug: DebugParams | None = None,
    return_stats: bool = False,
):
    """Render ``spp`` samples/pixel. Returns (H, W, 3) f32 in [0,1],
    row 0 at the image bottom (GL orientation; io flips on export)."""
    opts = opts or TraceOptions()
    dcam = derive_camera(camera)
    backend = opts.backend
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "jnp"
        if backend == "pallas":
            try:
                from raytracer_tpu.render import pallas_kernel  # noqa: F401
            except ImportError:
                backend = "jnp"
    if backend == "pallas":
        from raytracer_tpu.render.pallas_kernel import render_image_pallas
        from raytracer_tpu.utils.resilience import retry_on_device_fault

        @retry_on_device_fault
        def _run_pallas():
            # block inside the retry scope so worker crashes surface here
            # (device buffers don't survive a crash; the whole render is
            # the recovery unit — inputs re-upload from host on retry)
            return jax.block_until_ready(
                render_image_pallas(
                    scene, dcam, width, height, spp, key, opts, debug,
                    return_stats=return_stats,
                )
            )

        return _run_pallas()
    if backend == "jnp":
        from raytracer_tpu.utils.resilience import retry_on_device_fault

        fn = _jitted_jnp(
            width, height, spp, opts, return_stats, debug is not None
        )

        @retry_on_device_fault
        def _run_jnp():
            return jax.block_until_ready(
                fn(scene, dcam, key,
                   debug if debug is not None else DebugParams.none())
            )

        return _run_jnp()
    raise ValueError(f"unknown backend {backend!r}")
