"""Adaptive convergence-wall floor: chunk-size × tolerance matrix.

The adaptive render decides convergence between chunks, so the sorted
chunk size (what _chunk_schedule actually emits — roughly 2× the
adaptive_chunk_spp cap) is the per-pixel overshoot floor. This measures
the cover-scene wall/mean-spp/quality across that knob to find the
"wall-clock to converge" floor (BASELINE's <2 s criterion framing).

Run on device (one TPU process at a time):
    python scripts/measure_adaptive_floor.py          # rr5, full matrix
    ADAPTIVE_RR=0 ADAPTIVE_CAPS=0,16 python scripts/measure_adaptive_floor.py
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import dataclasses

import jax
import numpy as np

from raytracer_tpu.render import pallas_kernel as pk
from raytracer_tpu.render.api import render_image
from raytracer_tpu.render.options import TraceOptions
from raytracer_tpu.scene import presets

SPP = 500


def main():
    rr = int(_os.environ.get("ADAPTIVE_RR", "5"))
    caps = tuple(int(c) for c in
                 _os.environ.get("ADAPTIVE_CAPS", "0,24,20,16").split(","))
    sampler = _os.environ.get("ADAPTIVE_SAMPLER", "random")
    scene, cam, w, h, _, depth = presets.get_config("cover")
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=rr,
                        backend="pallas", sampler=sampler)
    key = jax.random.PRNGKey(0)

    def timed(o, k):
        # warm
        img, stats = render_image(scene, cam, w, h, SPP, k, o,
                                  return_stats=True)
        np.asarray(img)
        best, keep = None, None
        for i in range(2):
            t0 = time.perf_counter()
            img, stats = render_image(
                scene, cam, w, h, SPP, jax.random.fold_in(k, i), o,
                return_stats=True,
            )
            img = np.asarray(img)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, keep = dt, (img, stats)
        return best, keep[0], keep[1]

    tfix, img_fix, _ = timed(opts, key)
    print(f"fixed 500 spp (rr{rr}, {sampler}): {tfix:.2f}s", flush=True)

    for cap in caps:
        for tol in (0.1, 0.2):
            o = dataclasses.replace(opts, adaptive_tolerance=tol,
                                    adaptive_chunk_spp=cap)
            # report the schedule the knob actually produces
            chunk = pk._pick_chunk_spp(SPP, w * h, scene.count, depth, rr)
            ca = min(chunk, cap) if cap else min(chunk, pk.ADAPTIVE_AUTO_CHUNK)
            sizes, uniform = pk._chunk_schedule(SPP, ca)
            t, img, stats = timed(o, key)
            mad = float(np.abs(img - img_fix).mean())
            print(
                f"cap={cap or 'auto'} tol={tol}: wall={t:.2f}s "
                f"mean_spp={float(stats.get('mean_spp', SPP)):.0f} "
                f"mad_vs_fixed={mad:.1e} "
                f"schedule=[{sizes[0]}]+[{sizes[1]}]x{len(sizes)-1} "
                f"uniform={uniform}",
                flush=True,
            )


if __name__ == "__main__":
    main()
