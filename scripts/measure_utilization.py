"""Measure tile utilization of the production cover render, per chunk.

Replays the exact chunk schedule of ``_render_pallas`` (kernels come warm
from the persistent cache after a bench run) and reconstructs, from the
per-slot cost channels, each launch's tile utilization:

    util = sum(per-lane work) / (lanes_per_tile * sum_t max_lane_total(t))

i.e. the fraction of VPU iterations that carried live rays, given that a
tile runs until its most loaded lane finishes. The gap to 1.0 is the
structural waste that pixel sorting and K-slot virtual tiles remove; what
remains bounds how much more any load balancing can give (run on the
real TPU; kernels must be warm in the persistent cache or this compiles).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import numpy as np

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402


def util_of(out, k_slots):
    c = np.asarray(out[:, 3 * k_slots : 4 * k_slots])  # (nt, K, r, l)
    lane_tot = c.sum(axis=1)  # (nt, r, l)
    per_tile_max = lane_tot.max(axis=(1, 2))
    return lane_tot.sum() / (per_tile_max.sum() * lane_tot[0].size)


def accum_and_plan(acc, segments, out, inv, w, r_sub, k_slots):
    """Unfused mirror of _render_chunk_sorted's accumulate+plan, so the raw
    chunk output stays inspectable here."""
    flat = (
        pk._rgbc_channels(out, k_slots)
        .transpose(2, 0, 1, 3, 4)
        .reshape(4, -1)
    )
    acc = acc + jnp.take(flat, inv, axis=1)
    segments = segments + jnp.sum(out[:, 4 * k_slots, 0, 0])
    inv, pixel_map = pk._plan_from_cost(acc[3], w, r_sub, k_slots)
    return acc, segments, inv, pixel_map


def main(k_slots=4, spp=500, rr=5):
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=rr,
                        cluster_scan=False)  # flat-scan tile profile
    kd = jax.random.key_data(jax.random.PRNGKey(0)).astype(jnp.uint32)
    seed = (kd[0] ^ pk._lowbias32(kd[1])).astype(jnp.int32)

    base = pk._pick_chunk_spp(spp, w * h, scene.count, depth, rr)
    sizes, _ = pk._chunk_schedule(spp, base)  # production launch schedule
    chunk0 = sizes[0]
    r_sub = pk.DEFAULT_R_SUB

    t0 = time.perf_counter()
    out0 = pk._render_chunk(
        scene, dcam, seed, 0, w, h, chunk0, opts, r_sub, False,
        k_slots=k_slots,
    )
    np.asarray(out0)
    dt0 = time.perf_counter() - t0
    print(f"chunk0 (unsorted, spp={chunk0}): {dt0:.3f}s "
          f"util={util_of(out0, k_slots):.3f}")

    acc, segments, inv, pixel_map = pk._profile_to_plan(
        out0, w, h, r_sub, k_slots
    )
    jax.block_until_ready((acc, inv, pixel_map))
    offset = chunk0
    for cs in sizes[1:]:
        t0 = time.perf_counter()
        out = pk._render_chunk(
            scene, dcam, seed, offset, w, h, cs, opts, r_sub, False,
            pixel_map=pixel_map, k_slots=k_slots,
        )
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(f"chunk@{offset} (sorted, spp={cs}): {dt:.3f}s "
              f"util={util_of(out, k_slots):.3f}")
        acc, segments, inv, pixel_map = accum_and_plan(
            acc, segments, out, inv, w, r_sub, k_slots
        )
        offset += cs
    print(f"total segments={float(segments):.0f}")


if __name__ == "__main__":
    main(k_slots=int(sys.argv[1]) if len(sys.argv) > 1 else 4)
