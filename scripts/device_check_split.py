"""Device validation of the split scan + self-test kernel.

1. cover crop: split_scan on vs off must agree bitwise on hardware
   (the self-test restores the roundoff self-far-root case exactly).
2. timing of the full cover render with the split kernel.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
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
    # bitwise parity on a cover crop (multi-chunk, sorted, rr5)
    scene, cam, *_ = presets.get_config("cover", 256, 64)
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=20, russian_roulette_depth=5,
                        cluster_scan=False)
    key = jax.random.PRNGKey(11)
    flags = pk._containable_flags(scene, dcam, opts)
    print(f"cover crop: {int(flags.sum())}/{flags.shape[0]} containable")
    a, sa = pk.render_image_pallas(
        scene, dcam, 256, 64, 100, key, opts, return_stats=True
    )
    b, sb = pk.render_image_pallas(
        scene, dcam, 256, 64, 100, key,
        dataclasses.replace(opts, split_scan=False), return_stats=True,
    )
    a, b = np.asarray(a), np.asarray(b)
    print("split vs full bitwise:", np.array_equal(a, b),
          "maxdiff:", np.abs(a - b).max(),
          "segs:", float(sa["segments"]), float(sb["segments"]))

    # full cover timing
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)
    flags = pk._containable_flags(scene, dcam, opts)
    print(f"cover: {int(flags.sum())}/{flags.shape[0]} containable")

    def run(k):
        img, st = pk.render_image_pallas(
            scene, dcam, w, h, 500, k, opts, return_stats=True
        )
        np.asarray(img)
        return float(st["segments"])

    run(jax.random.PRNGKey(0))
    best = None
    for i in range(2):
        t0 = time.perf_counter()
        segs = run(jax.random.fold_in(jax.random.PRNGKey(0), i))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"cover split-scan rr5: wall={best:.3f}s {segs/best/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
