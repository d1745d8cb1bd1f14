"""Device verification of the cluster-aware chunk cost model
(TraceOptions.cluster_chunk_cost, default 0.5).

The exploratory sweep (BENCH_sessions/r5_chunk_schedule_AB_2026-08-19
.log) measured the flat-model schedule [41,153,153,153] at 351.2
Mrays/s vs chunk=180's [90,205,205] at 393.1 (1.12x) — the cluster
kernel finishes a launch ~2x faster than the flat cost model assumes,
so the flat budget buys twice the launches (dispatch + tile warm-up/
drain + a larger share of unsorted profile work) the watchdog needs.
This script verifies the PRODUCTION default (cost 0.5 -> [84,208,208])
against the pinned legacy schedule (cost 1.0) on real hardware:

- segment totals must be EXACTLY equal (schedule-invariant by design),
- images may differ only by f32 accumulation-order noise (mad < 5e-7;
  measured 3.5e-8-7.2e-8 across the sweep),
- the production schedule must be faster.

Also probes a QUARTER profile chunk (c0p = chunk//4 -> [42,229,229]):
the first chunk runs unsorted to build the pixel-cost profile, so a
smaller one shifts spp from unsorted to sorted launches, bought with a
noisier profile (worse tile balance in the sorted chunks). Promote to
a knob only if it wins here.

Usage: python scripts/bench_chunk_adopt.py [spp=500]
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
from scripts.bench_cluster_sweep import time_render  # noqa: E402


def _schedule_for(opts, spp, w, h, scene_count):
    chunk = pk._pick_chunk_spp(
        spp, w * h, scene_count, opts.max_depth,
        opts.russian_roulette_depth,
        cost_scale=opts.cluster_chunk_cost,
    )
    return pk._chunk_schedule(spp, chunk)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    key = jax.random.PRNGKey(0)
    prod = TraceOptions(max_depth=depth, russian_roulette_depth=5)
    legacy = dataclasses.replace(prod, cluster_chunk_cost=1.0)

    rows = []
    for name, opts in (("legacy cost=1.0", legacy),
                       ("prod   cost=0.5", prod)):
        sched = _schedule_for(opts, spp, w, h, scene.count)
        wall, segs, img = time_render(scene, dcam, w, h, spp, opts, key)
        rows.append((name, sched, wall, segs, img))
        print(f"{name}: schedule={sched[0]} wall={wall:.3f}s "
              f"({segs / wall / 1e6:.1f} Mrays/s)", flush=True)

    # quarter-profile probe: same budget, smaller unsorted first chunk
    real = pk._chunk_schedule

    def quarter(spp_, chunk):
        if spp_ <= chunk:
            return [spp_], False
        c0p = max(1, chunk // 4)
        n0 = max(1, -(-(spp_ - c0p) // (2 * chunk)))
        for n in range(n0, n0 + 256):
            cs = -(-(spp_ - c0p) // n)
            c0 = spp_ - n * cs
            if 1 <= c0 <= chunk and max(2, chunk // 2) <= cs <= 2 * chunk:
                return [c0] + [cs] * n, True
        return real(spp_, chunk)

    pk._chunk_schedule = quarter
    try:
        sched_q = _schedule_for(prod, spp, w, h, scene.count)
        wall_q, segs_q, img_q = time_render(
            scene, dcam, w, h, spp, prod, key
        )
        rows.append(("probe  c0p=1/4 ", sched_q, wall_q, segs_q, img_q))
        print(f"probe  c0p=1/4 : schedule={sched_q[0]} wall={wall_q:.3f}s "
              f"({segs_q / wall_q / 1e6:.1f} Mrays/s)", flush=True)
    finally:
        pk._chunk_schedule = real

    # drift control: re-time the legacy config last
    wall_l2, _, _ = time_render(scene, dcam, w, h, spp, legacy, key)
    drift = wall_l2 / rows[0][2]
    print(f"legacy re-run: {wall_l2:.3f}s (drift {drift:.3f}x)", flush=True)

    (_, _, wall_l, segs_l, img_l) = rows[0]
    ok = True
    for name, _, wall, segs, img in rows[1:]:
        mad = float(np.abs(img - img_l).mean())
        segs_eq = segs == segs_l
        ok &= segs_eq and mad < 5e-7
        print(f"{name}: segs_equal={segs_eq} mad_vs_legacy={mad:.2e}",
              flush=True)
    speedup = wall_l / rows[1][2]
    verdict = "ADOPT" if ok and speedup > 1.0 else (
        "REJECT" if not ok else "KEEP-LEGACY")
    print(f"VERDICT={verdict} prod_speedup={speedup:.3f}x "
          f"quarter_vs_prod={rows[1][2] / rows[2][2]:.3f}x", flush=True)
    return 0 if verdict == "ADOPT" else 1


if __name__ == "__main__":
    raise SystemExit(main())
