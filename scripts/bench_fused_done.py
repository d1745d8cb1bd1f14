"""Device A/B of the fused bounce-done test (cluster_fused_done).

The unfused gathered walk discovers bounce completion only at the START
of the next iteration (nearest-unvisited vs the PRE-visit best), so
every bounce pays one full slab+extract+gather iteration that visits
nothing. With the cover's measured ~1-2 visited clusters per bounce
that idle iteration is 33-50% of all walk iterations. The fused walk
extracts cluster_cpi+1 selections and completes the bounce in the
visiting iteration when selection cpi cannot beat the just-updated
best — same stop rule on the same entry/best pair, one iteration
earlier, so the visited set/order, image, and exact segment totals are
unchanged by construction (interpret-mode bitwise parity verified
across packed x cpi in {1,2}; tests/test_pallas.py pins it).

Interpret mode cannot price the extra extraction round (~3 vector ops +
a min-reduce per row per iteration) against the saved iterations — this
script is the decision point, run on the production config (kd:16,
packed cursor, box bounds, cpi=1).

Gates (same as every cluster A/B): the fused image must match the
unfused production render BITWISE with exact-equal segment totals;
VERDICT=ADOPT only if >= 1.03x faster with both gates green.

Usage: python scripts/bench_fused_done.py [spp_timing=500]
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

    def run(kk):
        out, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, kk, opts, return_stats=True
        )
        nonlocal img
        img = np.asarray(out)
        return float(st["segments"])

    segs = run(key)  # warm (compile + cold-stream straggler)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run(key)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs, img


def main():
    spp_t = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    base = TraceOptions(
        max_depth=depth, russian_roulette_depth=5, cluster_scan=True,
        cluster_fused_done=False,
    )
    key = jax.random.PRNGKey(0)

    wall_u, segs_u, img_u = time_render(scene, dcam, w, h, spp_t, base, key)
    print(
        f"cover {w}x{h} spp{spp_t} d{depth} rr5 (kd:16 packed box cpi=1): "
        f"unfused={wall_u:.3f}s ({segs_u / wall_u / 1e6:.1f} Mrays/s)"
    )

    of = dataclasses.replace(base, cluster_fused_done=True)
    try:
        wall_f, segs_f, img_f = time_render(scene, dcam, w, h, spp_t, of, key)
    except Exception as e:  # lowering/compile failure is a result
        print(f"fused: FAILED {type(e).__name__}: {str(e)[:200]}")
        print("VERDICT=REJECT")
        return
    bitwise = np.array_equal(img_f, img_u)
    seg_ok = segs_f == segs_u
    speedup = wall_u / wall_f
    maxd = float(
        np.abs(img_f.astype(np.float64) - img_u.astype(np.float64)).max()
    )
    print(
        f"fused: {wall_f:.3f}s ({segs_f / wall_f / 1e6:.1f} Mrays/s) "
        f"speedup={speedup:.3f}x bitwise={bitwise} "
        f"segs_equal={seg_ok} max|d|={maxd:.2e}"
    )
    if bitwise and seg_ok and speedup >= 1.03:
        print(f"VERDICT=ADOPT fused_done speedup={speedup:.3f}x")
    else:
        print("VERDICT=REJECT")


if __name__ == "__main__":
    main()
