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


def resolve_backend(backend: str) -> str:
    """Resolve 'auto' to a concrete backend: Pallas on TPU, jnp elsewhere
    (the CPU test backend runs Pallas only in interpret mode, which is for
    kernel tests, not rendering). Shared by the offline entry point below,
    the progressive step, and the viewer/engine so every 'auto' user gets
    the fast kernel where it exists (VERDICT r2 #7)."""
    if backend != "auto":
        return backend
    if _on_tpu():
        try:
            from raytracer_tpu.render import pallas_kernel  # noqa: F401

            return "pallas"
        except ImportError:
            return "jnp"
    return "jnp"


@functools.lru_cache(maxsize=32)
def _jitted_jnp(width: int, height: int, band_h: int, spp: int,
                opts: TraceOptions, with_debug: bool):
    """One fully-jitted LINEAR chunk render per static config — a single
    device program instead of thousands of eager dispatches (critical when
    the device sits behind a network tunnel). Gamma/averaging happen in
    the caller so chunks can accumulate. ``band_h`` < height renders a
    horizontal band at a traced row offset (one program for all bands)."""
    import dataclasses

    lin_opts = dataclasses.replace(opts, gamma=False)

    def fn(scene, dcam, key, debug, sample_offset, row_offset):
        img, stats = render_image_jnp(
            scene, dcam, width, height, spp, key, lin_opts,
            debug if with_debug else None, return_stats=True,
            sample_offset=sample_offset, row_offset=row_offset,
            band_height=band_h,
        )
        return img * spp, stats  # linear SUM for cross-chunk accumulation

    return jax.jit(fn)


# per-execution work bound for the jnp tracer, in ray-sphere tests at the
# ACTUAL depth (its bounce fori runs max_depth iterations regardless of
# live lanes). Measured on v5e: ~1.5e10 runs fault-free (304x200 x 10 spp
# x d50 x 487 spheres), ~2.3e10 crashed the worker (full-res cover at
# 1 spp) — 5e9 keeps executions in the seconds range with 3x headroom.
_JNP_EXEC_BUDGET = 5e9


def _jnp_chunk_spp(spp: int, p: int, s_count: int, max_depth: int) -> int:
    """spp per execution for a p-pixel grid (>=1: row banding below caps
    the residual when even 1 spp exceeds the budget)."""
    per_sample = p * max_depth * max(s_count, 1)
    return max(1, min(spp, int(_JNP_EXEC_BUDGET // max(per_sample, 1))))


def _jnp_band_rows(width: int, height: int, s_count: int,
                   max_depth: int) -> int:
    """Rows per execution: the full height when a 1-spp full-grid pass
    fits the budget (the common case — banded renders are statistically,
    not bitwise, equivalent; see render_image_jnp), else a band small
    enough that 1 spp x band fits. Multiples of 8 for clean accumulation;
    the last band may be shorter."""
    per_row = width * max_depth * max(s_count, 1)
    if per_row * height <= _JNP_EXEC_BUDGET:
        return height
    rows = max(8, int(_JNP_EXEC_BUDGET // per_row) // 8 * 8)
    return min(height, rows)


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
    if spp < 1:
        # both backends finalize with a 1/spp scale — fail clearly instead
        # of a ZeroDivisionError deep in the chunk loop (ADVICE r2)
        raise ValueError(f"spp must be >= 1, got {spp}")
    opts = opts or TraceOptions()
    dcam = derive_camera(camera)
    backend = resolve_backend(opts.backend)
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
        band = _jnp_band_rows(width, height, scene.count, opts.max_depth)
        chunk = _jnp_chunk_spp(spp, width * band, scene.count,
                               opts.max_depth)
        fn = _jitted_jnp(width, height, band, chunk, opts,
                         debug is not None)
        tail = spp - (spp // chunk) * chunk
        fn_tail = (
            _jitted_jnp(width, height, band, tail, opts, debug is not None)
            if tail else None
        )
        fn_last = {}  # band_h -> jitted fn, for a shorter final band

        def _band_fn(bh, cs):
            if bh == band:
                return fn if cs == chunk else fn_tail
            k = (bh, cs)
            if k not in fn_last:
                fn_last[k] = _jitted_jnp(width, height, bh, cs, opts,
                                         debug is not None)
            return fn_last[k]

        @retry_on_device_fault
        def _run_jnp():
            rows_acc, segments = [], None
            for row0 in range(0, height, band):
                bh = min(band, height - row0)
                # distinct RNG streams per band (draws are batch-position
                # keyed); single-band renders keep the legacy key exactly
                bkey = (
                    key if band >= height
                    else jax.random.fold_in(key, 7_000_000 + row0)
                )
                acc = None
                offset = 0
                while offset < spp:
                    cs = chunk if spp - offset >= chunk else tail
                    img, stats = _band_fn(bh, cs)(
                        scene, dcam, bkey, dbg,
                        jnp.asarray(offset, jnp.int32),
                        jnp.asarray(row0, jnp.int32),
                    )
                    acc = img if acc is None else acc + img
                    segments = (
                        stats["segments"] if segments is None
                        else segments + stats["segments"]
                    )
                    offset += cs
                rows_acc.append(acc)
            acc = (
                rows_acc[0] if len(rows_acc) == 1
                else jnp.concatenate(rows_acc, axis=0)
            )
            color = acc * (1.0 / spp)
            if opts.gamma:
                color = jnp.sqrt(jnp.maximum(color, 0.0))
            return jax.block_until_ready(
                (color, {"segments": segments}) if return_stats else color
            )

        return _run_jnp()
    raise ValueError(f"unknown backend {backend!r}")
