"""Per-strip marginal cost vs fixed per-iteration overhead of the scan.

Appending INACTIVE spheres to the cover scene changes nothing about the
rendered image, the RNG streams, or the per-lane path work (inactive
slots are encoded unhittable) — it only adds sublane-strips to the
closest-hit scan. Timing the same unsorted chunk at several paddings
gives a clean linear fit:

    T(strips) = fixed + slope * strips

slope*61 / T(61) is the scan-proportional share; the remainder is the
per-iteration overhead (RNG, materials, bookkeeping, gather, loop).
Decides where the next kernel optimization should aim (PERF.md).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402

CHUNK_SPP = 20


def main():
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)  # flat-scan probe

    results = []
    for total in (488, 744, 1024):
        s = scene.pad_to(total)
        split = pk._containable_split(s, dcam, opts)
        perm, g_full = split
        s = jax.tree_util.tree_map(lambda a: a[perm], s)

        def run():
            out = pk._render_chunk(
                s, dcam, jnp.int32(7), 0, w, h, CHUNK_SPP, opts,
                pk.DEFAULT_R_SUB, False, k_slots=4, g_full=g_full,
            )
            return np.asarray(out[:, 16, 0, 0]).sum()  # segments: force

        segs = run()  # warm/compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            segs = run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        strips = total // 8
        print(f"strips={strips} (S={total}, g_full={g_full}): "
              f"{best:.3f}s segs={segs:.0f}")
        results.append((strips, best))

    (s0, t0), (s1, t1), (s2, t2) = results
    slope = (t2 - t0) / (s2 - s0)
    fixed = t0 - slope * s0
    mid_pred = fixed + slope * s1
    print(f"slope={slope*1e3:.2f} ms/strip  fixed={fixed:.3f}s "
          f"({fixed/t0*100:.0f}% of natural)  "
          f"linearity check @ {s1}: pred {mid_pred:.3f}s vs {t1:.3f}s")


if __name__ == "__main__":
    main()
