"""Paired sorted-vs-unsorted A/B on any BASELINE config (round 5).

The round-5 small-scene ablation (PERF.md) showed no-sort 1.7x FASTER
than the sorted default on dof — but that table also showed 1.4-1.6x
wall drift between processes minutes apart for identical work, so a
single-shot comparison can't decide a default. This interleaves the
two variants within one process, N pairs, and reports per-pair walls
plus medians: tunnel-epoch drift hits both arms of a pair equally, so
the RATIO is trustworthy even when absolute walls wander.

The profile-guided pixel sort (PERF.md round 2: +35-40% on cover) costs
a profile pass (depth-4 walk counting) plus gather/scatter; its payoff
is tile load balance, which scales with per-pixel cost VARIANCE. Small
scenes (dof: 5 spheres, no clusters) have little variance to balance —
the hypothesis is the profile pass is pure overhead there.

Images must stay bitwise-equal (the sort only re-packs pixels into
tiles; accumulation order per pixel is unchanged by design).

Usage: python scripts/bench_sort_ab.py [config ...] [pairs=N]
Default: dof three_sphere cover, 4 pairs each.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import dataclasses
import statistics
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


def one(scene, dcam, w, h, spp, opts, key):
    out, st = pk.render_image_pallas(
        scene, dcam, w, h, spp, key, opts, return_stats=True
    )
    img = np.asarray(out)
    return img, float(st["segments"])


def main():
    args = sys.argv[1:]
    pairs = 4
    configs = []
    for a in args:
        if a.startswith("pairs="):
            pairs = int(a.split("=")[1])
        else:
            configs.append(a)
    configs = configs or ["dof", "three_sphere", "cover"]
    key = jax.random.PRNGKey(0)

    for name in configs:
        scene, cam, w, h, spp, depth = presets.get_config(name)
        dcam = derive_camera(cam)
        o_s = TraceOptions(max_depth=depth, russian_roulette_depth=5)
        o_u = dataclasses.replace(o_s, sort_pixels=False)

        # warm both arms (compile + cold-stream straggler)
        img_s, segs = one(scene, dcam, w, h, spp, o_s, key)
        img_u, segs_u = one(scene, dcam, w, h, spp, o_u, key)
        bitwise = np.array_equal(img_s, img_u)
        rows = []
        for i in range(pairs):
            t0 = time.perf_counter()
            one(scene, dcam, w, h, spp, o_s, key)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            one(scene, dcam, w, h, spp, o_u, key)
            tu = time.perf_counter() - t0
            rows.append((ts, tu))
            print(
                f"{name} pair {i}: sorted={ts:.3f}s unsorted={tu:.3f}s "
                f"ratio={ts / tu:.3f}",
                flush=True,
            )
        med_s = statistics.median(r[0] for r in rows)
        med_u = statistics.median(r[1] for r in rows)
        print(
            f"{name} {w}x{h} spp{spp} d{depth}: median sorted={med_s:.3f}s "
            f"({segs / med_s / 1e6:.1f} Mrays/s) unsorted={med_u:.3f}s "
            f"({segs_u / med_u / 1e6:.1f} Mrays/s) "
            f"sorted/unsorted={med_s / med_u:.3f}x bitwise={bitwise} "
            f"segs_equal={segs == segs_u}",
            flush=True,
        )


if __name__ == "__main__":
    main()
