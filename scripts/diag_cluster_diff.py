"""Diagnose the cluster-vs-flat image mismatch seen in bench_cluster.py.

Renders the cover scene flat and cluster (args: bounds cpi spp) with the
SAME key and prints the full diff census: differing-pixel count, max/mean
|delta|, segment counts, and the first few differing pixel coordinates
with both values. A handful of isolated pixels at small |delta| is the
exact-q-tie signature (visit order vs slot order picks a different
winner on exact f32 q ties); a broad diff is an arithmetic divergence.

Usage: python scripts/diag_cluster_diff.py [bounds=box] [cpi=1] [spp=500]
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import dataclasses
import sys

import jax
import numpy as np

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402


def main():
    bounds = sys.argv[1] if len(sys.argv) > 1 else "box"
    cpi = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)  # flat reference
    oc = dataclasses.replace(
        opts, cluster_scan=True, cluster_cpi=cpi, cluster_bounds=bounds
    )
    key = jax.random.PRNGKey(0)

    def run(o):
        img, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, key, o, return_stats=True
        )
        return np.asarray(img), float(st["segments"])

    img_f, segs_f = run(opts)
    img_c, segs_c = run(oc)
    d = np.abs(img_f.astype(np.float64) - img_c.astype(np.float64))
    dp = d.max(axis=-1)  # per-pixel max-channel delta
    bad = np.argwhere(dp > 0)
    print(f"segments: flat={segs_f:.0f} cluster={segs_c:.0f} "
          f"delta={segs_c - segs_f:+.0f}")
    print(f"pixels differing: {len(bad)} / {w * h} "
          f"({100.0 * len(bad) / (w * h):.4f}%)")
    if len(bad):
        print(f"max|d|={d.max():.3e}  mean|d| over diff px="
              f"{dp[dp > 0].mean():.3e}  image mean|d|={d.mean():.3e}")
        for y, x in bad[:8]:
            print(f"  px({x},{y}): flat={img_f[y, x]} cluster={img_c[y, x]}")
    else:
        print("BITWISE EQUAL")


if __name__ == "__main__":
    main()
