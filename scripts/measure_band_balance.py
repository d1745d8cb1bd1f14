"""Adaptive rows-mesh load balance: contiguous bands vs block interleave.

The adaptive sharded render stops per pixel, so a rows-shard's work is
(approximately) the sum of its pixels' sample counts — the spp_map the
adaptive render already reports. This script renders a scene adaptively
ONCE (single chip; the spp_map is layout-independent because per-pixel
stop decisions derive from absolute pixel statistics), then slices that
map into the bands each layout would assign to each shard and reports:

- per-shard sample shares for the CONTIGUOUS band layout (shard s gets
  rows [s*H/N, (s+1)*H/N)) and the INTERLEAVED layout
  (options.interleave_rows: every N-th (k_slots*r_sub)-row block);
- the implied adaptive scaling efficiency = mean share / max share
  (the mesh waits on the busiest shard).

Usage:
  python scripts/measure_band_balance.py [config] [WxH] [spp] [tol] [N...]
Defaults: cover 300x200 128 0.2 2 4 8 — small enough for a CPU
interpret run (pass 1200x800 500 on device for the headline numbers).
CPU runs force the local backend exactly like tests/conftest.py.
"""

import sys

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.parallel.sharding import _shard_tile_params  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402


def shares(spp_map: np.ndarray, n: int, block: int | None):
    """Per-shard sample shares: contiguous bands (block=None) or
    round-robin blocks of ``block`` rows."""
    h = spp_map.shape[0]
    per_row = spp_map.sum(axis=1)
    if block is None:
        bands = per_row.reshape(n, h // n).sum(axis=1)
    else:
        owner = (np.arange(h) // block) % n
        bands = np.array([per_row[owner == s].sum() for s in range(n)])
    return bands / bands.sum()


def main():
    args = [a for a in sys.argv[1:] if a != "--tpu"]
    config = args[0] if len(args) > 0 else "cover"
    w, h = map(int, (args[1] if len(args) > 1 else "300x200").split("x"))
    spp = int(args[2]) if len(args) > 2 else 128
    tol = float(args[3]) if len(args) > 3 else 0.2
    meshes = [int(a) for a in args[4:]] or [2, 4, 8]

    scene, cam, *_ = presets.get_config(config, w, h)
    opts = TraceOptions(
        max_depth=8, russian_roulette_depth=5, adaptive_tolerance=tol
    )
    _, stats = pk.render_image_pallas(
        scene, derive_camera(cam), w, h, spp, jax.random.PRNGKey(0), opts,
        return_stats=True,
    )
    spp_map = np.asarray(stats["spp_map"], np.float64)
    print(
        f"config={config} {w}x{h} spp={spp} tol={tol} "
        f"mean_spp={float(stats['mean_spp']):.1f}"
    )
    for n in meshes:
        if h % (n * 8):
            print(f"N={n}: skipped (height {h} % {n * 8} != 0)")
            continue
        r_sub, k_slots = _shard_tile_params(h // n)
        g = r_sub * k_slots
        sc = shares(spp_map, n, None)
        si = shares(spp_map, n, g)
        print(
            f"N={n} block={g}: contiguous shares="
            f"[{', '.join(f'{x:.3f}' for x in sc)}] eff={sc.mean() / sc.max():.3f}"
            f" | interleaved shares=[{', '.join(f'{x:.3f}' for x in si)}]"
            f" eff={si.mean() / si.max():.3f}"
        )


if __name__ == "__main__":
    main()
