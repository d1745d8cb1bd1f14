"""Steady-state progressive frame times (the reference's primary realtime
use case, static/shader.frag:387-404): jitted 1-spp step with buffer
donation, zero host round-trips per frame except the final sync.

Prints ms/frame and fps for the PERF.md realtime table. Run on the real
TPU; frames are timed in batches with one device sync per batch so the
~50-90 ms tunnel latency amortizes (matches how the viewer consumes
frames: it reads the accum buffer only when it draws).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from raytracer_tpu.progressive.state import init_render_state  # noqa: E402
from raytracer_tpu.progressive.step import make_step_fn  # noqa: E402
from raytracer_tpu.render.options import DebugParams, TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402

BATCH = 25


def bench(config: str, width: int, height: int, backend: str = "pallas",
          static: bool = False):
    """``static=True`` passes the scene as a factory hint (the CLI's
    fixed-scene accumulation / viewer contract): the gathered cluster
    scan's partition is host-built once and the per-frame kernel walks
    clusters instead of the flat scan — the production interactive
    configuration for >=64-sphere scenes since the round-4 ADOPT. The
    camera hint stays OFF (a fly-cam session can't promise it)."""
    scene, cam, *_ = presets.get_config(config, width, height)
    opts = TraceOptions(max_depth=8)
    step = make_step_fn(width, height, spp=1, opts=opts, backend=backend,
                        static_scene=scene if static else None)
    state = init_render_state(width, height, jax.random.PRNGKey(0))
    debug = DebugParams.none()
    for _ in range(5):  # warm (compile + steady accumulation)
        state, aux = step(state, scene, cam, debug)
    float(aux["segments"])  # sync: block_until_ready under-reports
    best = None             # through the tunnel (CLAUDE.md)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(BATCH):
            state, aux = step(state, scene, cam, debug)
        # scalar device→host read depends on the whole frame chain: one
        # ~60 ms round trip amortized over the batch
        float(aux["segments"])
        dt = (time.perf_counter() - t0) / BATCH
        best = dt if best is None else min(best, dt)
    tag = " static-scene(cluster)" if static else ""
    print(f"{config} {width}x{height} 1spp d8 [{backend}]{tag}: "
          f"{best*1e3:.1f} ms/frame  {1.0/best:.1f} fps")


def main():
    bench("demo", 1280, 720)
    bench("demo", 1920, 1080)
    bench("cover", 1200, 800)
    # the cluster-scan interactive win (static scene hint; demo's 9
    # spheres stay flat under the >=64 gate, so only cover changes)
    bench("cover", 1200, 800, static=True)


if __name__ == "__main__":
    main()
