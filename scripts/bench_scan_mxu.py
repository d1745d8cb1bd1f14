"""Device A/B of the MXU scan offload (TraceOptions.scan_mxu).

The closest-hit scan's per-sphere dot products ride two
(S_pad,4)@(4,128) DEFAULT-precision matmuls per ray row instead of
~10 VPU el-ops/slot (render/pallas_kernel.py). Interpret mode cannot
reproduce either the MXU's bf16 operand rounding or the VPU/MXU
overlap, so this script is the decision point:

  1. wall-clock cover render, scan_mxu off vs on (best of 3);
  2. physics drift: mean|Delta| of the two 64-spp images (the DEFAULT
     matmuls fuzz candidate ordering near ties; the exact winner
     re-evaluation keeps hit geometry f32 — drift must stay well under
     the FIDELITY band, mean|Delta| < 5e-3 at 64 spp);
  3. drift vs the jnp tracer for the MXU image (absolute anchor).

Exit 0 and print VERDICT=ADOPT if speedup >= 1.05x and drift passes;
VERDICT=REJECT otherwise (exit 0 either way; exit 1 on errors).

Usage: python scripts/bench_scan_mxu.py [spp_timing=500] [spp_drift=64]
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
from raytracer_tpu.render.tracer import render_image_jnp  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402


def time_render(scene, dcam, w, h, spp, opts, key, reps=3):
    def run(kk):
        img, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, kk, opts, return_stats=True
        )
        np.asarray(img)
        return float(st["segments"])

    segs = run(key)  # warm (compile + cold-stream straggler)
    best = None
    for i in range(reps):
        t0 = time.perf_counter()
        run(jax.random.fold_in(key, i + 1))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs


def main():
    spp_t = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spp_d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)  # flat baseline for the MXU A/B
    opts_m = dataclasses.replace(opts, scan_mxu=True)
    key = jax.random.PRNGKey(0)

    wall_s, segs_s = time_render(scene, dcam, w, h, spp_t, opts, key)
    wall_m, segs_m = time_render(scene, dcam, w, h, spp_t, opts_m, key)
    mrays_s = segs_s / wall_s / 1e6
    mrays_m = segs_m / wall_m / 1e6
    speedup = wall_s / wall_m
    print(
        f"cover {w}x{h} spp{spp_t} d{depth} rr5: "
        f"vpu={wall_s:.3f}s ({mrays_s:.1f} Mrays/s)  "
        f"mxu={wall_m:.3f}s ({mrays_m:.1f} Mrays/s)  "
        f"speedup={speedup:.3f}x"
    )

    # physics drift at spp_d (same key/streams: differences are purely
    # the scan numerics)
    kd = jax.random.PRNGKey(7)
    img_s = np.asarray(
        pk.render_image_pallas(scene, dcam, w, h, spp_d, kd, opts)
    )
    img_m = np.asarray(
        pk.render_image_pallas(scene, dcam, w, h, spp_d, kd, opts_m)
    )
    drift = float(np.abs(img_m - img_s).mean())
    p999 = float(np.quantile(np.abs(img_m - img_s), 0.999))
    img_j = np.asarray(
        render_image_jnp(scene, dcam, w, h, spp_d, kd, opts)
    )
    drift_j_m = float(np.abs(img_m - img_j).mean())
    drift_j_s = float(np.abs(img_s - img_j).mean())
    print(
        f"drift @{spp_d}spp: mxu-vs-vpu mean|D|={drift:.2e} "
        f"p99.9={p999:.2e}; vs jnp: mxu={drift_j_m:.4f} vpu={drift_j_s:.4f}"
    )

    ok = speedup >= 1.05 and drift < 5e-3 and drift_j_m < 1.5 * max(
        drift_j_s, 1e-3
    )
    print(f"VERDICT={'ADOPT' if ok else 'REJECT'}")


if __name__ == "__main__":
    main()
