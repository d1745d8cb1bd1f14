"""Device A/B of the gathered cluster scan (TraceOptions.cluster_scan).

The round-4 per-lane culling design: grid-cell clusters + per-lane
Mosaic dynamic gather + bounce-done-masked regeneration
(render/pallas_kernel.py). The host cost model projects 1.6-2.2x over
the flat scan on measured cover segment populations
(scripts/measure_cluster_hits.py); interpret mode proves BITWISE image
parity but cannot price the gather/extract/while-loop on hardware —
this script is the decision point:

  1. wall-clock cover render, flat vs cluster at every (bounds, cpi)
     variant (best of 3 each, shared golden-free physics cross-check);
  2. physics: images must match the flat render BITWISE (they do in
     interpret mode; a device mismatch means a Mosaic lowering bug —
     REJECT regardless of speed). Caught once already: the padded
     cluster layout used to shift the spp chunk schedule, drifting the
     f32 accumulation order (<=6.6e-7, segments equal) — fixed by
     budgeting chunks with the original count (chunk_count plumb-through
     in render_image_pallas); max|d| is printed so a recurrence is
     diagnosable from the log.

Variants: bounds in {sphere, box} x cpi. The box (member-AABB slab)
broad phase is the round-4 model favorite — measured cover segment
populations project 2.85x at box/cpi=1 vs 2.13x at sphere/cpi=2
(scripts/measure_cluster_hits.py) — but Mosaic issue costs are the
model's blind spot, hence the on-device sweep.

Prints VERDICT=ADOPT bounds=<kind> cpi=<best> if any variant is
>= 1.05x faster with bitwise parity; VERDICT=REJECT otherwise
(exit 0 either way).

Usage: python scripts/bench_cluster.py [spp_timing=500] \
           [bounds:cpi,... | cpi,...]   (bare cpi implies sphere)
Default sweep: box:1,box:2,sphere:2,sphere:3 (model-ranked order).
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
    for i in range(reps):
        t0 = time.perf_counter()
        run(key)  # same key: identical work, and img is the parity image
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs, img


def main():
    spp_t = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    if len(sys.argv) > 2:
        variants = []
        for tok in sys.argv[2].split(","):
            if ":" in tok:
                b, c = tok.split(":")
                variants.append((b, int(c)))
            else:
                variants.append(("sphere", int(tok)))
    else:
        variants = [("box", 1), ("box", 2), ("sphere", 2), ("sphere", 3)]
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)  # flat baseline
    key = jax.random.PRNGKey(0)

    wall_f, segs_f, img_f = time_render(scene, dcam, w, h, spp_t, opts, key)
    print(
        f"cover {w}x{h} spp{spp_t} d{depth} rr5: "
        f"flat={wall_f:.3f}s ({segs_f / wall_f / 1e6:.1f} Mrays/s)"
    )

    best, best_speedup = None, 0.0
    for bounds, cpi in variants:
        oc = dataclasses.replace(
            opts, cluster_scan=True, cluster_cpi=cpi, cluster_bounds=bounds
        )
        tag = f"{bounds}:cpi={cpi}"
        try:
            wall_c, segs_c, img_c = time_render(
                scene, dcam, w, h, spp_t, oc, key
            )
        except Exception as e:  # lowering/compile failure is a result
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        bitwise = np.array_equal(img_c, img_f)
        seg_ok = segs_c == segs_f
        speedup = wall_f / wall_c
        maxd = float(
            np.abs(img_c.astype(np.float64) - img_f.astype(np.float64)).max()
        )
        print(
            f"{tag}: {wall_c:.3f}s ({segs_c / wall_c / 1e6:.1f} "
            f"Mrays/s) speedup={speedup:.3f}x bitwise={bitwise} "
            f"segs_equal={seg_ok} max|d|={maxd:.2e}"
        )
        if bitwise and seg_ok and speedup > best_speedup:
            best, best_speedup = (bounds, cpi), speedup

    if best is not None and best_speedup >= 1.05:
        print(
            f"VERDICT=ADOPT bounds={best[0]} cpi={best[1]} "
            f"speedup={best_speedup:.3f}x"
        )
    else:
        print("VERDICT=REJECT")


if __name__ == "__main__":
    main()
