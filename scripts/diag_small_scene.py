"""Diagnose the round-4 matrix anomaly on small scenes (VERDICT r4 #4).

The only round-4 BASELINE matrix capture read three_sphere 161.6 and
dof 276.8 Mrays/s vs the round-2 ledger's 316 / 544 (PERF.md) — ~2x
slower walls on configs whose kernels fit a single unsorted launch.
The regression window is rounds 3-4 (round 3's matrix capture was
lost to the tunnel outage), so the suspects are knobs added since
round 2. This times each config under an ablation matrix:

  default        production TraceOptions (rr5)
  rr0            no Russian roulette (round-2 table rows were rr5)
  no-split       split_scan=False (drops the far-root self-test carries)
  no-sort        sort_pixels=False (these configs are single-chunk
                 anyway - must be a no-op; a difference means the
                 chunk budget moved)
  k1             k_slots=1 (round-2's table predates K-slot tiles)
  d8             max_depth=8 (depth sensitivity: the bounce loop exits
                 by live-lane count, but carries/regs scale with code)

Each row: best-of-3 warm wall + Mrays/s. Usage:
  python scripts/diag_small_scene.py [config ...]   (default: both)
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


def time_one(scene, dcam, w, h, spp, opts, key, k_slots=4, reps=3):
    def run():
        out, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, key, opts, return_stats=True,
            k_slots=k_slots,
        )
        np.asarray(out)
        return float(st["segments"])

    segs = run()  # warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs


def main():
    configs = sys.argv[1:] or ["three_sphere", "dof"]
    key = jax.random.PRNGKey(0)
    for name in configs:
        scene, cam, w, h, spp, depth = presets.get_config(name)
        dcam = derive_camera(cam)
        base = TraceOptions(max_depth=depth, russian_roulette_depth=5)
        rows = [
            ("default", base, 4),
            ("rr0", dataclasses.replace(base, russian_roulette_depth=0), 4),
            ("no-split", dataclasses.replace(base, split_scan=False), 4),
            ("no-sort", dataclasses.replace(base, sort_pixels=False), 4),
            ("k1", base, 1),
            ("d8", dataclasses.replace(base, max_depth=8), 4),
        ]
        print(f"== {name} {w}x{h} spp{spp} d{depth} ==", flush=True)
        for tag, opts, ks in rows:
            try:
                wall, segs = time_one(scene, dcam, w, h, spp, opts, key,
                                      k_slots=ks)
                print(
                    f"{tag:>8}: {wall:.3f}s  {segs / wall / 1e6:7.1f} "
                    f"Mrays/s  (segs {segs:.0f})",
                    flush=True,
                )
            except Exception as e:
                print(f"{tag:>8}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
