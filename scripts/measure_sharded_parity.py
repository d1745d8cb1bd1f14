"""Per-chip efficiency parity: sharded vs single-chip Pallas (VERDICT r2 #3).

Replays the production chunk schedules of both paths in INTERPRET mode on
CPU (no TPU needed) and compares the tile-time cost model per segment:

    model_cost = sum over launches, tiles of max_lane_total_iterations
                 x (lanes per tile)

i.e. the VPU-iteration bill given that a tile runs until its most loaded
lane finishes. Both paths now run the same machinery (profile chunk,
profile-guided sorting, K-slot virtual tiles, shared _chunk_schedule), so
the per-chip model cost per traced segment should agree within ~10%; this
script is the receipt.

The shard side replays shard 0 of a rows-mesh by calling the kernel with
the shard's literal (local_height, row_offset) — exactly what the
shard_map body passes — so no multi-device runtime is required.

Run: python scripts/measure_sharded_parity.py   (forces CPU)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402

W, H, SPP, DEPTH, CHUNK = 256, 64, 24, 20, 8  # forced multi-chunk: [4,10,10]


def replay(scene, dcam, seed, local_h, row_offset, r_sub, k_slots, opts,
           g_full):
    """One chip's production schedule (profile + sorted chunks), unfused so
    per-chunk cost channels stay inspectable. Returns (model_cost,
    segments)."""
    sizes, _ = pk._chunk_schedule(SPP, CHUNK)
    cost_total = 0.0
    segments = 0.0
    out = pk._render_chunk_impl(
        scene, dcam, seed, 0, W, H, sizes[0], opts, r_sub, True,
        local_height=local_h, row_offset=row_offset, k_slots=k_slots,
        g_full=g_full,
    )
    acc = pk._tiles_to_flat(out, W, local_h, r_sub, k_slots)
    inv, pm = pk._plan_from_cost(acc[3], W, r_sub, k_slots, row_offset)
    cost_total += tile_cost(out, k_slots)
    segments += float(np.asarray(out[:, 4 * k_slots, 0, 0]).sum())
    offset = sizes[0]
    for cs in sizes[1:]:
        out = pk._render_chunk_impl(
            scene, dcam, seed, offset, W, H, cs, opts, r_sub, True,
            local_height=local_h, row_offset=row_offset, pixel_map=pm,
            k_slots=k_slots, g_full=g_full,
        )
        cost_total += tile_cost(out, k_slots)
        segments += float(np.asarray(out[:, 4 * k_slots, 0, 0]).sum())
        acc, _ = pk._accumulate_sorted(out, acc, jnp.zeros((2,), jnp.int32), inv,
                                       k_slots)
        inv, pm = pk._plan_from_cost(acc[3], W, r_sub, k_slots, row_offset)
        offset += cs
    return cost_total, segments


def tile_cost(out, k_slots):
    c = np.asarray(out[:, 3 * k_slots : 4 * k_slots])  # (nt, K, r, l)
    lane_tot = c.sum(axis=1)  # (nt, r, l)
    lanes = lane_tot[0].size
    return float(lane_tot.max(axis=(1, 2)).sum() * lanes)


def main():
    scene, cam, *_ = presets.get_config("cover", W, H)
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=DEPTH, russian_roulette_depth=5,
                        cluster_scan=False)
    kd = jax.random.key_data(jax.random.PRNGKey(0)).astype(jnp.uint32)
    seed = (kd[0] ^ pk._lowbias32(kd[1])).astype(jnp.int32)
    split = pk._containable_split(scene, dcam, opts)
    if split is not None:
        perm, g_full = split
        if perm is not None:
            scene = jax.tree_util.tree_map(lambda a: a[perm], scene)
    else:
        g_full = None

    # single chip: full image, k_slots per the production guard
    r_sub, k1 = 8, 4
    while k1 > 1 and H < k1 * r_sub:
        k1 //= 2
    cost_1, segs_1 = replay(scene, dcam, seed, H, 0, r_sub, k1, opts,
                            g_full)

    # shard 0 of a rows=2 mesh (the other shard is symmetric)
    from raytracer_tpu.parallel.sharding import _shard_tile_params

    local_h = H // 2
    r_sub, k2 = _shard_tile_params(local_h)
    cost_a, segs_a = replay(scene, dcam, seed, local_h, 0, r_sub, k2,
                            opts, g_full)
    cost_b, segs_b = replay(scene, dcam, seed, local_h, local_h, r_sub,
                            k2, opts, g_full)
    cost_2 = cost_a + cost_b
    segs_2 = segs_a + segs_b

    eff_1 = cost_1 / segs_1
    eff_2 = cost_2 / segs_2
    print(f"single-chip : model_cost={cost_1:.3e} segments={segs_1:.0f} "
          f"cost/segment={eff_1:.2f}")
    print(f"rows=2 mesh : model_cost={cost_2:.3e} segments={segs_2:.0f} "
          f"cost/segment={eff_2:.2f} (sum of both shards)")
    ratio = eff_2 / eff_1
    print(f"per-chip cost/segment ratio sharded/single = {ratio:.3f}")
    assert segs_1 == segs_2 or abs(segs_1 - segs_2) / segs_1 < 1e-6, (
        "RNG parity broken: sharded and single-chip traced different work")
    if ratio > 1.10:
        print("WARN: sharded per-chip efficiency >10% worse than single")
        return 1
    return 0


if __name__ == "__main__":
    _sys.exit(main())
