"""Device A/B: kd-split cluster partition vs the production grid.

The cover's grid partition (cell 4.0, group 16) lands at K=36 clusters
→ 40 padded bound-table rows with cells only 9-16/16 full. The balanced
kd bisection (scene/accel.py _kd_chunks) packs the same 484 small
spheres into K=31 full leaves → 32 rows: one fewer vreg row in the
kernel's dominant per-iteration broad+extract phase (slopes:
scripts/probe_cluster_slopes.py), bought with ~10% looser boxes
(measured union volume 201 vs 183). Bounds stay conservative, so every
variant must be bitwise- and segment-identical to the flat anchor.

Also sweeps kd at group 32 (K=16 → 2 vreg rows, double member cost) and
group 8 (K=61 → 8 rows, half member cost) to bracket the trade.

Usage: python scripts/bench_cluster_kd.py [spp=500]
Prints ADOPT/KEEP verdict vs the production grid config.
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


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    base = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=False)
    key = jax.random.PRNGKey(0)

    wall_f, segs_f, img_f = time_render(scene, dcam, w, h, spp, base, key)
    print(f"cover {w}x{h} spp{spp} d{depth} rr5: flat={wall_f:.3f}s "
          f"({segs_f / wall_f / 1e6:.1f} Mrays/s)", flush=True)

    rows = [("grid:16", dict(cluster_partition="grid", cluster_group=16)),
            ("grid:16+packed", dict(cluster_partition="grid",
                                    cluster_group=16,
                                    cluster_packed_key=True)),
            ("kd:16", dict(cluster_partition="kd", cluster_group=16)),
            ("kd:16+packed", dict(cluster_partition="kd",
                                  cluster_group=16,
                                  cluster_packed_key=True)),
            ("kd:32+packed", dict(cluster_partition="kd",
                                  cluster_group=32,
                                  cluster_packed_key=True)),
            ("kd:8+packed", dict(cluster_partition="kd", cluster_group=8,
                                 cluster_packed_key=True))]
    results = {}
    for name, kw in rows:
        oc = dataclasses.replace(base, cluster_scan=True, **kw)
        part = pk._cluster_partition(scene, oc)
        if part is None:
            print(f"{name}: SKIP (no partition)", flush=True)
            continue
        k = part.bounds.shape[0]
        wall, segs, img = time_render(scene, dcam, w, h, spp, oc, key)
        bitwise = np.array_equal(img, img_f)
        ok = bitwise and segs == segs_f
        print(f"{name} (K={k}, pad {max(8, -(-k // 8) * 8)}): "
              f"{wall:.3f}s ({segs / wall / 1e6:.1f} Mrays/s) "
              f"speedup={wall_f / wall:.3f}x bitwise={bitwise} "
              f"segs_equal={segs == segs_f}", flush=True)
        if ok:
            results[name] = wall

    if "grid:16" in results:
        prod = results["grid:16"]
        best = min(results, key=results.get)
        if best != "grid:16" and results[best] < 0.98 * prod:
            print(f"VERDICT=ADOPT {best} wall={results[best]:.3f}s "
                  f"({segs_f / results[best] / 1e6:.1f} Mrays/s) "
                  f"vs grid {prod:.3f}s "
                  f"({prod / results[best]:.3f}x)")
        else:
            print(f"VERDICT=KEEP grid:16 ({prod:.3f}s); best={best} "
                  f"{results[best]:.3f}s")


if __name__ == "__main__":
    main()
