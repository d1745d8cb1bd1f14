"""Publish the VPU roofline for the cover render (VERDICT r2 #2).

Grounds the >500 Mrays/s BASELINE target in hardware arithmetic:

1. Measures the v5e VPU f32 element-op ceiling with the same
   independent-chain Pallas microbenchmark as scripts/bench_bf16_vpu.py
   (8-way ILP, fma chains — the practical issue-rate ceiling, not a
   datasheet number).
2. Times one warm production cover chunk (sorted layout, split scan,
   K-slots) and converts its exact on-device segment count into
   sustained scan element-ops/s via the kernel's static op account.
3. Emits: sustained vs ceiling (the scan's "MFU"), the implied
   per-segment op budget at 500 Mrays/s, and the candidate-reduction
   factor that budget represents.

Static op account (per ray-bounce segment, per sphere slot; counted
from render/pallas_kernel.py's scan body):
  full-logic slot (g_full prefix): c·d (3 fma) + c·o (3 fma) + nb (1)
  + c_coef (2) + disc (2) + sq select+sqrt (3) + q_near (1) + q_far (1)
  + near/far select (2) + candidate mask (2) + min tree (1)  = 21 ops
  near-only slot: drops q_far + near/far select               = 18 ops
The per-segment FIXED work (RNG, materials, bookkeeping, ~21% measured
by ablation) and the MXU gather (~10%) ride other units/budgets; the
roofline below is for the scan, which the ablation pegs at ~72-79% of
chunk time and the layout shootout shows is issue-bound.

Run on the real TPU: python scripts/roofline.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402

OPS_FULL = 21
OPS_NEAR = 18
TARGET = 500e6


def vpu_ceiling():
    from jax.experimental import pallas as pl

    ITERS, CHAINS, OPS = 20000, 8, 16

    def kernel(x_ref, o_ref):
        x = x_ref[...]

        def body(_, acc):
            outs = []
            for c in range(CHAINS):
                v = acc[c]
                for k in range(OPS):
                    v = v * x[c] + x[(c + k + 1) % CHAINS]
                outs.append(v)
            return outs

        acc = [x[c] + jnp.asarray(c, jnp.float32) for c in range(CHAINS)]
        acc = jax.lax.fori_loop(0, ITERS, body, acc)
        out = acc[0]
        for c in range(1, CHAINS):
            out = out + acc[c]
        o_ref[...] = out

    rows = 16
    x = jnp.full((CHAINS, rows, 128), 1.0000001, jnp.float32)
    fn = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32)
    ))
    np.asarray(fn(x))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return ITERS * CHAINS * OPS * 2 * rows * 128 / best


def main():
    ceiling = vpu_ceiling()
    print(f"VPU f32 ceiling (independent fma chains): "
          f"{ceiling / 1e12:.2f} Telem-ops/s")

    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=5)
    kd = jax.random.key_data(jax.random.PRNGKey(0)).astype(jnp.uint32)
    seed = (kd[0] ^ pk._lowbias32(kd[1])).astype(jnp.int32)
    perm, g_full = pk._containable_split(scene, dcam, opts)
    if perm is not None:
        scene = jax.tree_util.tree_map(lambda a: a[perm], scene)
    s_pad = pk._pad_spheres(scene.count)
    spp = 40

    def run(k):
        out = pk._render_chunk(
            scene, dcam, seed + k, 0, w, h, spp, opts, 8, False,
            k_slots=4, g_full=g_full,
        )
        segs = float(np.asarray(out[:, 16, 0, 0]).sum())
        return segs

    run(0)  # warm
    best, segs = None, 0.0
    for i in range(3):
        t0 = time.perf_counter()
        s = run(i)
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, segs = dt, s

    ops_per_seg = g_full * OPS_FULL + (s_pad - g_full) * OPS_NEAR
    rate = segs / best
    sustained = rate * ops_per_seg
    mfu = sustained / ceiling
    budget_at_target = ceiling / TARGET  # el-ops per segment at 500M
    slots_at_target = budget_at_target / OPS_FULL
    result = {
        "vpu_ceiling_telops": round(ceiling / 1e12, 3),
        "chunk_wall_s": round(best, 3),
        "chunk_segments": segs,
        "chunk_mrays": round(rate / 1e6, 1),
        "scan_ops_per_segment": ops_per_seg,
        "g_full": g_full,
        "s_pad": s_pad,
        "sustained_scan_telops": round(sustained / 1e12, 3),
        "scan_mfu_vs_ceiling": round(mfu, 3),
        "ops_budget_per_segment_at_500M": int(budget_at_target),
        "full_slots_affordable_at_500M": int(slots_at_target),
        "candidate_reduction_needed": round(s_pad / slots_at_target, 2),
    }
    print(json.dumps(result, indent=1))
    print(
        f"\nReading: the scan sustains {sustained/1e12:.2f} T el-ops/s "
        f"= {mfu:.0%} of the measured VPU ceiling. At that ceiling, "
        f"500 Mrays/s affords {int(budget_at_target)} scan ops/segment "
        f"= {int(slots_at_target)} full-logic slots — the 512-slot scan "
        f"must shrink {s_pad/slots_at_target:.1f}x. Every per-lane "
        f"candidate-reduction design is measured dead (PERF.md); the "
        f"single-chip plateau of this architecture is the ceiling/"
        f"(ops/segment) line: {ceiling/ops_per_seg/1e6:.0f} Mrays/s at "
        f"100% scan MFU and zero fixed costs."
    )


if __name__ == "__main__":
    main()
