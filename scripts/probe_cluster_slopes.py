"""Per-phase cost slopes of the production cluster kernel (round 5).

VERDICT r4 #3: "measure where the 3.2 s now goes (broad phase vs member
gather vs nearest-unvisited extract vs fixed costs)". The cost model
(PERF.md) projected 2.85x for box:cpi=1; hardware delivers 2.0x — this
probe measures the gap's anatomy directly on device.

Method: TraceOptions.cluster_pad_k / cluster_pad_group append UNHITTABLE
rows to the bound table / member lists. Padding is image-, segment- and
RNG-invariant (verified bitwise per run below), so wall-clock vs pad is
a clean linear probe of per-phase cost:

  wall(pad_k)     slope = (broad slab test + extract chain) per 8-row
                  bound-table vreg group, integrated over all iterations
  wall(pad_group) slope = (4 dynamic_gathers + exact quadratic) per
                  member slot, integrated over all iterations

The intercepts + production sizes (K_pad/8 = 5 vreg rows, group = 16)
decompose the total wall into broad+extract / member / fixed. The
"speed-of-light" lines print what eliminating each phase entirely would
buy — the ceiling for any optimization of that phase.

Usage: python scripts/probe_cluster_slopes.py [spp=500]
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
from raytracer_tpu.scene import presets  # noqa: E402


def time_render(scene, dcam, w, h, spp, opts, key, reps=3):
    img = None

    def run():
        out, st = pk.render_image_pallas(
            scene, dcam, w, h, spp, key, opts, return_stats=True
        )
        nonlocal img
        img = np.asarray(out)
        return float(st["segments"])

    segs = run()  # warm (compile + cold-stream straggler)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, segs, img


def fit_slope(xs, ys):
    x = np.asarray(xs, np.float64)
    y = np.asarray(ys, np.float64)
    a, b = np.polyfit(x, y, 1)
    return float(a), float(b)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scene, cam, w, h, _, depth = presets.get_config("cover")
    dcam = derive_camera(cam)
    base = TraceOptions(max_depth=depth, russian_roulette_depth=5,
                        cluster_scan=True)
    key = jax.random.PRNGKey(0)

    part = pk._cluster_partition(scene, base)
    k = part.bounds.shape[0]
    k_pad0 = max(8, -(-k // 8) * 8)
    vregs0 = k_pad0 // 8
    group0 = base.cluster_group
    print(f"cover {w}x{h} spp{spp} d{depth} rr5 | K={k} K_pad={k_pad0} "
          f"({vregs0} vreg rows), group={group0}, cpi={base.cluster_cpi}, "
          f"bounds={base.cluster_bounds}", flush=True)

    wall0, segs0, img0 = time_render(scene, dcam, w, h, spp, base, key)
    print(f"base: {wall0:.3f}s ({segs0 / wall0 / 1e6:.1f} Mrays/s)",
          flush=True)

    # --- K_pad slope (broad phase + extract scale together) ---
    k_walls = [(vregs0, wall0)]
    for pad in (1, 2, 3):
        o = dataclasses.replace(base, cluster_pad_k=pad)
        wall, segs, img = time_render(scene, dcam, w, h, spp, o, key)
        ok = np.array_equal(img, img0) and segs == segs0
        print(f"pad_k=+{8 * pad} (K_pad {k_pad0 + 8 * pad}): {wall:.3f}s "
              f"invariant={ok}", flush=True)
        if ok:
            k_walls.append((vregs0 + pad, wall))

    # --- group slope (member gathers + exact tests) ---
    g_walls = [(group0, wall0)]
    for pad in (8, 16):
        o = dataclasses.replace(base, cluster_pad_group=pad)
        wall, segs, img = time_render(scene, dcam, w, h, spp, o, key)
        ok = np.array_equal(img, img0) and segs == segs0
        print(f"pad_group=+{pad} (group {group0 + pad}): {wall:.3f}s "
              f"invariant={ok}", flush=True)
        if ok:
            g_walls.append((group0 + pad, wall))

    # --- globals slope (idempotent re-tests of global sphere 0) ---
    n_global = part.n_global
    gl_walls = [(n_global, wall0)]
    for pad in (4, 8):
        o = dataclasses.replace(base, cluster_pad_global=pad)
        wall, segs, img = time_render(scene, dcam, w, h, spp, o, key)
        ok = np.array_equal(img, img0) and segs == segs0
        print(f"pad_global=+{pad} (globals {n_global + pad}): {wall:.3f}s "
              f"invariant={ok}", flush=True)
        if ok:
            gl_walls.append((n_global + pad, wall))

    # --- winner-bank slope (never-selected zero banks) ---
    import raytracer_tpu.render.pallas_kernel as pkm
    n_banks = -(-part.scene.count // pkm.LANES)
    b_walls = [(n_banks, wall0)]
    for pad in (2, 4):
        o = dataclasses.replace(base, cluster_pad_banks=pad)
        wall, segs, img = time_render(scene, dcam, w, h, spp, o, key)
        ok = np.array_equal(img, img0) and segs == segs0
        print(f"pad_banks=+{pad} (banks {n_banks + pad}): {wall:.3f}s "
              f"invariant={ok}", flush=True)
        if ok:
            b_walls.append((n_banks + pad, wall))

    # --- residual-tail replays: RNG block / accum round / genray ---
    tails = {}
    for knob, pads in (("pad_rng", (1, 2)), ("pad_accum", (1, 2)),
                       ("pad_genray", (1, 2))):
        walls = [(0, wall0)]
        for pad in pads:
            o = dataclasses.replace(base, **{knob: pad})
            wall, segs, img = time_render(scene, dcam, w, h, spp, o, key)
            ok = np.array_equal(img, img0) and segs == segs0
            print(f"{knob}=+{pad}: {wall:.3f}s invariant={ok}",
                  flush=True)
            if ok:
                walls.append((pad, wall))
        tails[knob] = (fit_slope(*zip(*walls))[0]
                       if len(walls) > 1 else 0.0)

    # drift check: re-render base at the end of the session
    wall_end, _, img_end = time_render(scene, dcam, w, h, spp, base, key)
    print(f"base re-run: {wall_end:.3f}s (drift "
          f"{wall_end / wall0:.3f}x) invariant="
          f"{np.array_equal(img_end, img0)}", flush=True)

    s_k, _ = fit_slope(*zip(*[(x, y) for x, y in k_walls]))
    s_g, _ = fit_slope(*zip(*[(x, y) for x, y in g_walls]))
    s_gl = (fit_slope(*zip(*gl_walls))[0] if len(gl_walls) > 1 else 0.0)
    s_b = (fit_slope(*zip(*b_walls))[0] if len(b_walls) > 1 else 0.0)
    broad_extract = s_k * vregs0
    member = s_g * group0
    globals_c = s_gl * n_global
    winner = s_b * n_banks
    fixed = wall0 - broad_extract - member - globals_c - winner
    print("\n== decomposition (production config) ==")
    print(f"broad+extract: {broad_extract:.3f}s "
          f"({100 * broad_extract / wall0:.0f}%)  "
          f"[{s_k * 1e3:.1f} ms per bound vreg row x {vregs0}]")
    print(f"member phase:  {member:.3f}s ({100 * member / wall0:.0f}%)  "
          f"[{s_g * 1e3:.1f} ms per member slot x {group0}]")
    print(f"globals phase: {globals_c:.3f}s "
          f"({100 * globals_c / wall0:.0f}%)  "
          f"[{s_gl * 1e3:.1f} ms per global x {n_global}]")
    print(f"winner gather: {winner:.3f}s ({100 * winner / wall0:.0f}%)  "
          f"[{s_b * 1e3:.1f} ms per bank x {n_banks}]")
    print(f"residual:      {fixed:.3f}s ({100 * fixed / wall0:.0f}%)  "
          f"[scatter/regen, RNG, accumulation, loop, dispatch]")
    rng_c = tails.get("pad_rng", 0.0)
    acc_c = tails.get("pad_accum", 0.0)
    gen_c = tails.get("pad_genray", 0.0)
    rest = fixed - rng_c - acc_c - gen_c
    print("\n== residual split (1 replay = 1 real phase round) ==")
    print(f"scatter RNG block: {rng_c:.3f}s ({100 * rng_c / wall0:.0f}%)")
    print(f"accumulation rnd:  {acc_c:.3f}s ({100 * acc_c / wall0:.0f}%)")
    print(f"camera-ray regen:  {gen_c:.3f}s ({100 * gen_c / wall0:.0f}%)")
    print(f"scatter math/loop: {rest:.3f}s ({100 * rest / wall0:.0f}%)")
    print("\n== speed-of-light bounds ==")
    for name, saved in (("no broad+extract", broad_extract),
                        ("no member phase", member),
                        ("no globals phase", globals_c),
                        ("no winner gather", winner),
                        ("no scatter RNG", rng_c),
                        ("no accumulation", acc_c),
                        ("no camera regen", gen_c),
                        ("K_pad 40 -> 32", s_k),
                        ("group 16 -> 12", 4 * s_g)):
        wl = wall0 - saved
        print(f"{name}: {wl:.3f}s ({segs0 / wl / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
