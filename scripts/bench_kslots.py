"""Cover-scene timing for a given K (k_slots) — perf experiment harness.

Usage: python scripts/bench_kslots.py [K] [spp] [rr]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    rr = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=rr,
                        cluster_scan=False)
    key = jax.random.PRNGKey(0)

    def run(kk):
        img, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, kk, opts, return_stats=True, k_slots=k
        )
        np.asarray(img)
        return float(st["segments"])

    run(key)  # warm
    best = None
    for i in range(2):
        t0 = time.perf_counter()
        segs = run(jax.random.fold_in(key, i))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"cover {w}x{h} spp{spp} d{depth} rr{rr} K={k}: wall={best:.3f}s "
        f"{segs / best / 1e6:.1f} Mrays/s"
    )


if __name__ == "__main__":
    main()
