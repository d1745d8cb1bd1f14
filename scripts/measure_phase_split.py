"""Measure the primary/extension phase-split design space (VERDICT r2 #1).

Three measurements on the cover scene, cited in PERF.md's round-3 ledger:

1. Primary candidate-window sizes (host cone analysis,
   render/primary.py): how small a per-tile sphere table the primary
   bounce could scan.
2. Primary share of total segments (one real 40-spp chunk's cost
   channel on device; falls back to a cached chunk if present).
3. Tile utilization of every RECORD-FEASIBLE extension-phase layout,
   computed from the measured per-pixel residual (bounce>=1) costs:
   phase-2 records are pinned to spatial tiles (Mosaic has no per-lane
   gather — scripts/probe_mosaic_gather.py), so the extension kernel can
   group K spatial bands per tile (adjacent / strided / cost-sorted) but
   can NEVER use the per-pixel profile sort the production kernel runs.

Run on the real TPU (one chunk render) or pass a saved cost .npy.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

SPP = 40


def layout_table(cost2, h, w, spp):
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    resid = cost2 - spp

    def util(lane_costs):
        t = lane_costs.reshape(-1, 1024)
        return t.sum() / (t.max(axis=1).sum() * 1024)

    R = np.zeros((hp, wp))
    R[:h, :w] = resid
    bands = (
        R.reshape(hp // 8, 8, wp // 128, 128)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 1024)
    )
    print("extension-phase (residual-cost) layouts:")
    print(f"  K=1 spatial bands, unsorted : util {util(bands):.3f}")
    nb = bands.shape[0]
    for K in (4, 8):
        g = bands[: nb // K * K].reshape(-1, K, 1024)
        print(f"  K={K} adjacent bands        : util {util(g.sum(axis=1)):.3f}")
        idx = np.arange(nb // K * K).reshape(K, -1).T
        print(f"  K={K} strided bands         : util "
              f"{util(bands[idx].sum(axis=1)):.3f}")
        order = np.argsort(-bands.sum(axis=1))
        g = bands[order[: nb // K * K].reshape(-1, K)]
        print(f"  K={K} cost-sorted bands     : util {util(g.sum(axis=1)):.3f}")
    ps = np.sort(R.reshape(-1))[::-1]
    print(f"  per-pixel sort (INFEASIBLE) : util "
          f"{util(ps[: ps.size // 1024 * 1024].reshape(-1, 1024)):.3f}")
    A = np.zeros((hp, wp))
    A[:h, :w] = cost2
    bf = (
        A.reshape(hp // 8, 8, wp // 128, 128)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 1024)
    )
    print(f"full-path K=1 unsorted        : util {util(bf):.3f}")
    order = np.argsort(-A.reshape(-1))
    ps = A.reshape(-1)[order]
    print(f"full-path per-pixel sort      : util "
          f"{util(ps[: ps.size // 1024 * 1024].reshape(-1, 1024)):.3f} "
          "(the production kernel's machinery)")


def main():
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.camera.camera import derive_camera
    from raytracer_tpu.render import pallas_kernel as pk
    from raytracer_tpu.render.options import TraceOptions
    from raytracer_tpu.render.primary import candidate_windows, window_stats
    from raytracer_tpu.scene import presets
    from raytracer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)

    for cols, rows in ((128, 8), (128, 32)):
        ws = candidate_windows(scene, dcam, w, h, (cols, 0), rows)
        print(f"primary window {cols}x{rows}: {window_stats(ws)}")

    cache = _os.path.join("/tmp", "cover_cost_40spp.npy")
    if _os.path.exists(cache):
        cost2 = np.load(cache)
    else:
        opts = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                            cluster_scan=False)
        kd = jax.random.key_data(jax.random.PRNGKey(0)).astype(jnp.uint32)
        seed = (kd[0] ^ pk._lowbias32(kd[1])).astype(jnp.int32)
        split = pk._containable_split(scene, dcam, opts)
        # None when the analysis declines (small scene, split_scan off,
        # or a failed device probe) -> full-logic scan, no permutation
        perm, g_full = split if split is not None else (None, None)
        if perm is not None:
            scene_p = jax.tree_util.tree_map(lambda a: a[perm], scene)
        else:
            scene_p = scene
        out = pk._render_chunk(
            scene_p, dcam, seed, 0, w, h, SPP, opts, 8, False, k_slots=4,
            g_full=g_full,
        )
        flat = np.asarray(pk._tiles_to_flat(out, w, h, 8, 4))
        wp = -(-w // 128) * 128
        cost2 = flat[3].reshape(-1, wp)[:h, :w]
        np.save(cache, cost2)

    tot = cost2.sum()
    prim = cost2.size * SPP
    print(f"primary share of segments: {prim / tot:.3f} "
          f"({prim:.3e} of {tot:.3e} at {SPP} spp)")
    layout_table(cost2, h, w, SPP)


if __name__ == "__main__":
    main()
