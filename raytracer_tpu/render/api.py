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
                with_debug: bool):
    """One fully-jitted LINEAR chunk render per static config — a single
    device program instead of thousands of eager dispatches (critical when
    the device sits behind a network tunnel). Gamma/averaging happen in
    the caller so chunks can accumulate."""
    import dataclasses

    lin_opts = dataclasses.replace(opts, gamma=False)

    def fn(scene, dcam, key, debug, sample_offset):
        img, stats = render_image_jnp(
            scene, dcam, width, height, spp, key, lin_opts,
            debug if with_debug else None, return_stats=True,
            sample_offset=sample_offset,
        )
        return img * spp, stats  # linear SUM for cross-chunk accumulation

    return jax.jit(fn)


def _jnp_chunk_spp(spp: int, p: int, s_count: int, max_depth: int) -> int:
    """Bound one jnp-tracer execution: its per-sphere scan is a sequential
    fori, so a full 500-spp cover render in ONE XLA execution runs
    multi-minute and crashes the TPU worker (measured). ~5e9 ray-sphere
    tests per execution keeps launches in the seconds range."""
    per_sample = p * min(max_depth, 8) * max(s_count, 1)
    return max(1, min(spp, int(5e9 // max(per_sample, 1))))


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
        import jax.numpy as jnp

        from raytracer_tpu.utils.resilience import retry_on_device_fault

        dbg = debug if debug is not None else DebugParams.none()
        chunk = _jnp_chunk_spp(spp, width * height, scene.count,
                               opts.max_depth)
        fn = _jitted_jnp(width, height, chunk, opts, debug is not None)
        tail = spp - (spp // chunk) * chunk
        fn_tail = (
            _jitted_jnp(width, height, tail, opts, debug is not None)
            if tail else None
        )

        @retry_on_device_fault
        def _run_jnp():
            acc, segments = None, None
            offset = 0
            while offset < spp:
                f = fn if spp - offset >= chunk else fn_tail
                img, stats = f(scene, dcam, key, dbg,
                               jnp.asarray(offset, jnp.int32))
                acc = img if acc is None else acc + img
                segments = (
                    stats["segments"] if segments is None
                    else segments + stats["segments"]
                )
                offset += chunk if spp - offset >= chunk else tail
            color = acc * (1.0 / spp)
            if opts.gamma:
                color = jnp.sqrt(jnp.maximum(color, 0.0))
            return jax.block_until_ready(
                (color, {"segments": segments}) if return_stats else color
            )

        return _run_jnp()
    raise ValueError(f"unknown backend {backend!r}")
