"""Partition-shape sweep for the gathered cluster scan (round 5).

The adopted box:cpi=1 config (cell 4.0 / group 16 / K=36→40) measured
387.8 Mrays/s — 1.29x short of the >500 BASELINE bar. The cost model
(scripts/measure_cluster_hits.py, PERF.md round-4 tables) ranked
partitions by member tests + broad-phase ops per segment, but Mosaic
issue costs (the per-iteration fixed overhead: K_pad-row broad phase,
extract chain, gather setup) are its blind spot — so sweep the real
kernel on the real workload. Knobs are existing TraceOptions fields:

  cluster_cell   grid cell size (x, z): smaller cells → tighter boxes
                 (fewer member tests) but more clusters (broad-phase
                 rows scale with K_pad/8 sublane groups)
  cluster_group  members per cluster: smaller groups → fewer wasted
                 exact tests per selected cluster but larger K
  cluster_cpi    clusters extracted per iteration

K > 128 partitions are rejected by the kernel (lane addressing), so
cells below ~2.0 at group 16 fall back to the flat scan — the sweep
skips those rows with a note.

Physics safety: bounds are conservative for ANY partition (every
member sphere inside its cell box), and the A/B (bench_cluster.py)
already proved the mechanism bitwise on device — this sweep trusts
that and checks each variant's exact segment total + mean|Δ| against
the first variant's image instead of re-rendering the flat baseline
per row (one flat render at the top anchors both).

Usage: python scripts/bench_cluster_sweep.py [spp=500] \
          [cell:group:cpi,...]
Default sweep (model-plausible neighborhood of the adopted config):
  4:16:1 (adopted), 3:16:1, 5:16:1, 4:8:1, 4:8:2, 3:8:1, 6:24:1,
  4:16:2, 2.5:8:1
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

DEFAULT_SWEEP = "4:16:1,3:16:1,5:16:1,4:8:1,4:8:2,3:8:1,6:24:1,4:16:2,2.5:8:1"


def time_render(scene, dcam, w, h, spp, opts, key, reps=3):
    img = None

    def run():
        out, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, key, opts, return_stats=True
        )
        nonlocal img
        img = np.asarray(out)
        return float(st["segments"])

    segs = run()  # warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs, img


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    toks = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SWEEP).split(",")
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    base = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)
    key = jax.random.PRNGKey(0)

    wall_f, segs_f, img_f = time_render(scene, dcam, w, h, spp, base, key)
    print(
        f"cover {w}x{h} spp{spp} d{depth} rr5: flat={wall_f:.3f}s "
        f"({segs_f / wall_f / 1e6:.1f} Mrays/s)",
        flush=True,
    )

    best_row, best_wall = None, wall_f
    for tok in toks:
        cell, group, cpi = tok.split(":")
        oc = dataclasses.replace(
            base, cluster_scan=True, cluster_bounds="box",
            cluster_cell=float(cell), cluster_group=int(group),
            cluster_cpi=int(cpi),
        )
        part = pk._cluster_partition(scene, oc)
        if part is None:
            print(f"{tok}: SKIP (partition K out of kernel range)",
                  flush=True)
            continue
        k = part.bounds.shape[0]
        try:
            wall_c, segs_c, img_c = time_render(
                scene, dcam, w, h, spp, oc, key
            )
        except Exception as e:
            print(f"{tok}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        bitwise = np.array_equal(img_c, img_f)
        print(
            f"{tok} (K={k}, g={part.n_global}): {wall_c:.3f}s "
            f"({segs_c / wall_c / 1e6:.1f} Mrays/s) "
            f"speedup={wall_f / wall_c:.3f}x bitwise={bitwise} "
            f"segs_equal={segs_c == segs_f}",
            flush=True,
        )
        if bitwise and segs_c == segs_f and wall_c < best_wall:
            best_row, best_wall = tok, wall_c
    if best_row:
        print(
            f"BEST={best_row} wall={best_wall:.3f}s "
            f"({segs_f / best_wall / 1e6:.1f} Mrays/s)"
        )
    else:
        print("BEST=flat (no variant beat it with parity)")


if __name__ == "__main__":
    main()
