"""Render the preset gallery to docs/gallery/ (device).

The reference's ground truth is its README image gallery
(/root/reference/README.md:10-27, images/*.png). This renders our
equivalents — every BASELINE preset plus the beyond-reference AOV
debug views — as visual parity evidence.

    python scripts/render_gallery.py          # all
    python scripts/render_gallery.py dof      # one preset
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

from raytracer_tpu.app import io
from raytracer_tpu.render.api import render_image
from raytracer_tpu.render.debug import render_aov
from raytracer_tpu.render.options import TraceOptions
from raytracer_tpu.scene import presets

OUT = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                    "docs", "gallery")

# (name, spp override, rr) — rr5 for the deep cover render only; the
# shallow scenes run pure reference physics
JOBS = [
    ("two_sphere", 256, 0),
    ("three_sphere", 256, 0),
    ("dof", 256, 0),
    ("demo", 256, 0),
    # the reference gallery's headline image (images/14.png): the RTiOW
    # cover scene at the full BASELINE spp
    ("cover", 500, 5),
]
AOVS = ["normal", "depth", "uuid", "front"]


def render_adaptive_heatmap(key):
    """Cover at the <2 s adaptive configuration (tol 0.2, stratified) +
    its per-pixel sample-density heatmap — the visual receipt for the
    adaptive sampler's budget allocation (stats['spp_map'] /
    CLI --spp-map)."""
    scene, cam, w, h, _, depth = presets.get_config("cover")
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        backend="pallas", sampler="stratified",
                        adaptive_tolerance=0.2)
    t0 = time.perf_counter()
    img, stats = render_image(scene, cam, w, h, 500, key, opts,
                              return_stats=True)
    img = np.asarray(img)
    dt = time.perf_counter() - t0
    path = _os.path.join(OUT, f"cover_adaptive_tol0.2_{w}x{h}.png")
    io.save_png(path, img)
    print(f"cover adaptive: {dt:.1f}s mean_spp="
          f"{float(stats.get('mean_spp', 500)):.0f} -> {path}", flush=True)
    if "spp_map" in stats:
        m = np.asarray(stats["spp_map"], dtype=np.float32)
        heat = m / max(float(m.max()), 1.0)
        hpath = _os.path.join(OUT, f"cover_adaptive_sppmap_{w}x{h}.png")
        io.save_png(hpath, np.repeat(heat[..., None], 3, axis=-1))
        print(f"cover spp map (max {m.max():.0f}) -> {hpath}", flush=True)


def main(only=None):
    _os.makedirs(OUT, exist_ok=True)
    key = jax.random.PRNGKey(0)
    for name, spp, rr in JOBS:
        if only and name != only:
            continue
        scene, cam, w, h, _, depth = presets.get_config(name)
        opts = TraceOptions(max_depth=depth, russian_roulette_depth=rr,
                            backend="pallas")
        t0 = time.perf_counter()
        img = np.asarray(render_image(scene, cam, w, h, spp, key, opts))
        dt = time.perf_counter() - t0
        path = _os.path.join(OUT, f"{name}_{w}x{h}_{spp}spp.png")
        io.save_png(path, img)
        print(f"{name}: {w}x{h} {spp}spp -> {path} ({dt:.1f}s)", flush=True)
    if only in (None, "aov"):
        scene, cam, w, h, *_ = presets.get_config("demo", 640, 360)
        for aov in AOVS:
            img = np.asarray(render_aov(scene, cam, w, h, aov, key))
            path = _os.path.join(OUT, f"aov_{aov}_{w}x{h}.png")
            io.save_png(path, img)
            print(f"aov {aov} -> {path}", flush=True)
    if only in (None, "adaptive"):
        render_adaptive_heatmap(key)


if __name__ == "__main__":
    main(_sys.argv[1] if len(_sys.argv) > 1 else None)
