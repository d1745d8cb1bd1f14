"""Device re-measure of the fused UNSORTED path vs the sorted default.

Round-2 ledger idle suspicion (PERF.md): after the unsorted chunk loop
was fused into one lax.scan device program (commit f9930e0), the sorted
path's win might have narrowed — the sort's benefit is tile balance,
the fusion's benefit is dispatch count, and the two are now on equal
dispatch footing. This prints both walls and the ratio; the images must
stay bitwise-equal (shared `_chunk_schedule` guarantees identical
per-pixel accumulation order).

Usage: python scripts/bench_unsorted.py [spp=500]
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import dataclasses
import sys
import time

import jax
import numpy as np

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402


def time_render(scene, dcam, w, h, spp, opts, key, reps=3):
    img = None

    def run():
        out, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, key, opts, return_stats=True
        )
        nonlocal img
        img = np.asarray(out)
        return float(st["segments"])

    segs = run()  # warm (compile + cold-stream straggler)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs, img


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5)
    key = jax.random.PRNGKey(0)

    wall_s, segs_s, img_s = time_render(scene, dcam, w, h, spp, opts, key)
    print(
        f"cover {w}x{h} spp{spp} d{depth} rr5 sorted:   "
        f"{wall_s:.3f}s ({segs_s / wall_s / 1e6:.1f} Mrays/s)"
    )
    ou = dataclasses.replace(opts, sort_pixels=False)
    wall_u, segs_u, img_u = time_render(scene, dcam, w, h, spp, ou, key)
    print(
        f"cover {w}x{h} spp{spp} d{depth} rr5 unsorted: "
        f"{wall_u:.3f}s ({segs_u / wall_u / 1e6:.1f} Mrays/s)"
    )
    print(
        f"sorted/unsorted speedup {wall_u / wall_s:.3f}x  "
        f"bitwise={np.array_equal(img_s, img_u)}  "
        f"segs_equal={segs_s == segs_u}"
    )


if __name__ == "__main__":
    main()
