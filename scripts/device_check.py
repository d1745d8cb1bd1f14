"""One-command device regression gate (VERDICT r2 #5).

Runs the device-only correctness checks that interpret mode CANNOT
reproduce (CLAUDE.md pitfalls: XLA folding astype-based bf16 splits to
identity inside jit; Mosaic sqrt(negative) not being IEEE NaN), plus the
bitwise invariants of the production kernel's three layout machineries:

  1. bf16-split canary: the jitted params table's mid/lo planes must be
     nonzero and sum exactly back to the f32 values (a regression to an
     astype-based split silently becomes [x, 0, 0] under jit).
  2. split-scan parity: split_scan on vs off bitwise-identical on device
     (multi-chunk sorted render; exercises the far-root SELF-test).
  3. K-slot invariance: k_slots 1 vs 4 bitwise-identical (forced
     multi-chunk so the sorted/permuted path runs on hardware).
  3b. sorted sharded path (1-device mesh, k_slots=4) against the
     single-chip render (maxdiff < 1e-6 — band finalize order differs).
  4. device-vs-reference physics: the Pallas kernel against the
     independent jnp tracer, statistical (catches any wrong-image
     regression of the sqrt(negative)/poison-sentinel class).

Each check is a single cheap compile (persistent cache enabled). Exits
nonzero on any drift. Run before every BENCH capture:

    make device-check      # or: python scripts/device_check.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses

import jax
import numpy as np

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from raytracer_tpu.camera.camera import derive_camera  # noqa: E402
from raytracer_tpu.render import pallas_kernel as pk  # noqa: E402
from raytracer_tpu.render.options import TraceOptions  # noqa: E402
from raytracer_tpu.render.tracer import render_image_jnp  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402

FAILURES = []


def check(name: str, ok: bool, detail: str = ""):
    status = "ok" if ok else "FAIL"
    print(f"[device-check] {name}: {status} {detail}")
    if not ok:
        FAILURES.append(name)


def main() -> int:
    if jax.default_backend() != "tpu":
        print("[device-check] no TPU backend — this gate must run on "
              "device (interpret mode cannot reproduce these pitfalls)")
        return 2

    scene, cam, *_ = presets.get_config("cover", 256, 64)
    dcam = derive_camera(cam)

    # 1. bf16-split canary — INSIDE jit, where the excess-precision
    # simplifier lives. mid/lo must survive and the 3-term sum must
    # reconstruct f32 exactly.
    tbl = jax.jit(pk._params_table_t)(scene)
    hi, mid, lo = np.asarray(tbl)
    exact = np.asarray(pk._params_table_t(scene))  # eager = ground truth
    n_mid = int((mid != 0).sum())
    n_lo = int((lo != 0).sum())
    # f64 accumulation: the 3 terms are disjoint-exponent bf16 values, so
    # their f64 sum is exact and must equal the eager split's
    recon_ok = bool(np.array_equal(
        hi.astype(np.float64) + mid + lo,
        exact[0].astype(np.float64) + exact[1] + exact[2],
    ))
    check(
        "bf16-split", n_mid > 0 and n_lo > 0 and recon_ok,
        f"(mid nonzero: {n_mid}, lo nonzero: {n_lo}, exact-sum: {recon_ok})",
    )

    # 2. split-scan bitwise parity (rr5, depth 20). The chunk budget is
    # FORCED down so 100 spp becomes a profile chunk + fused sorted scan
    # ([18, 41, 41]) — the production layout for real 500-spp captures;
    # at this crop's natural budget the whole render would fit one
    # unsorted chunk and the gate would never exercise the sorted or
    # fused-scan machinery against split_scan on/off.
    # cluster_scan pinned OFF: this check exercises the FLAT scan's
    # split-scan machinery (cluster mode has nothing to split — caux
    # renders would make the on/off comparison vacuous). The production
    # cluster default is gated by check 6 below.
    opts = TraceOptions(max_depth=20, russian_roulette_depth=5,
                        cluster_scan=False)
    key = jax.random.PRNGKey(11)
    orig = pk._pick_chunk_spp
    try:
        pk._pick_chunk_spp = lambda spp, *args, **kw: min(spp, 37)
        a, sa = pk.render_image_pallas(
            scene, dcam, 256, 64, 100, key, opts, return_stats=True
        )
        b, sb = pk.render_image_pallas(
            scene, dcam, 256, 64, 100, key,
            dataclasses.replace(opts, split_scan=False), return_stats=True,
        )
        a, b = np.asarray(a), np.asarray(b)
    finally:
        pk._pick_chunk_spp = orig
    check(
        "split-scan", bool(np.array_equal(a, b)),
        f"(maxdiff {np.abs(a - b).max():.2e}, segs "
        f"{float(sa['segments']):.0f}/{float(sb['segments']):.0f})",
    )

    # 3. K-slot invariance (force multi-chunk so the sorted path runs)
    orig = pk._pick_chunk_spp
    try:
        pk._pick_chunk_spp = lambda spp, *args, **kw: min(spp, 3)
        opts8 = TraceOptions(max_depth=8, russian_roulette_depth=5,
                             cluster_scan=False)
        k7 = jax.random.PRNGKey(7)
        imgs = []
        for ks in (1, 4):
            img = pk.render_image_pallas(
                scene, dcam, 256, 64, 10, k7, opts8, k_slots=ks
            )
            imgs.append(np.asarray(img))
    finally:
        pk._pick_chunk_spp = orig
    check(
        "k-slots", bool(np.array_equal(imgs[0], imgs[1])),
        f"(maxdiff {np.abs(imgs[0] - imgs[1]).max():.2e})",
    )

    # 3b. sorted SHARDED path on hardware (1-device mesh, local_h=64 so
    # k_slots=4 survives _shard_tile_params): the per-shard
    # profile+sort+K-slot machinery must reproduce the single-chip
    # render. Not bitwise (band finalize order differs); measured
    # agreement is ~1e-8 (PERF.md round-3 sharded-parity note).
    from raytracer_tpu.parallel.sharding import (
        make_mesh, render_image_sharded_pallas,
    )

    mesh1 = make_mesh((1,), ("rows",))
    orig = pk._pick_chunk_spp
    try:
        pk._pick_chunk_spp = lambda spp, *args, **kw: min(spp, 3)
        img_sh = np.asarray(render_image_sharded_pallas(
            scene, cam, 256, 64, 10, k7, mesh1, opts8
        ))
        img_1c = np.asarray(pk.render_image_pallas(
            scene, dcam, 256, 64, 10, k7, opts8
        ))
    finally:
        pk._pick_chunk_spp = orig
    sh_max = float(np.abs(img_sh - img_1c).max())
    check("sharded-sorted", sh_max < 1e-6, f"(maxdiff {sh_max:.2e})")

    # 3c. UNSORTED fused chunk scan on hardware (the sort_pixels-off /
    # enable_debug dispatch path): forced multi-chunk so the uniform
    # schedule engages _render_chunks_scan_unsorted, which must stay
    # bitwise-equal to the sorted render (shared _chunk_schedule ⇒
    # identical per-pixel accumulation order).
    orig = pk._pick_chunk_spp
    try:
        pk._pick_chunk_spp = lambda spp, *args, **kw: min(spp, 3)
        img_uns = np.asarray(pk.render_image_pallas(
            scene, dcam, 256, 64, 10, k7,
            dataclasses.replace(opts8, sort_pixels=False),
        ))
    finally:
        pk._pick_chunk_spp = orig
    check(
        "unsorted-fused-scan", bool(np.array_equal(img_uns, imgs[1])),
        f"(maxdiff {np.abs(img_uns - imgs[1]).max():.2e})",
    )

    # 4. device physics vs the independent jnp tracer (statistical — the
    # functional net for sqrt(negative)/poison-sentinel regressions).
    # SAME physics both sides (rr0) at 32 spp: measured noise floor on
    # this glass-heavy crop is ~0.018 mean|d| (two independent 32-spp MC
    # estimates); 0.025 leaves noise headroom while catching the
    # wrong-image regressions this gate exists for (historically >0.1).
    # flat scan pinned: imgp is the FLAT reference image that checks 5/6
    # compare their variants against
    opts32 = TraceOptions(max_depth=8, cluster_scan=False)
    imgp, stats_flat = pk.render_image_pallas(
        scene, dcam, 256, 64, 32, k7, opts32, return_stats=True
    )
    imgp = np.asarray(imgp)
    imgj = np.asarray(
        render_image_jnp(scene, dcam, 256, 64, 32, k7, opts32)
    )
    d = np.abs(imgp - imgj)
    mad = float(np.nanmean(d))
    n_nan = int(np.isnan(d).sum())
    check("pallas-vs-jnp", mad < 0.025 and n_nan < 50,
          f"(mean|d| {mad:.4f}, nan px {n_nan})")

    # 5. stratified-sampler canary: the R2 camera draws are in-kernel
    # floor/frac arithmetic on absolute sample indices — verify on
    # hardware that (a) splitting spp across launches is bitwise-neutral
    # (the index is absolute; the CP-rotation counters -4..-1 are
    # chunk-independent) and (b) the stratified image agrees with the
    # random-sampler image statistically (same marginal distributions;
    # catches wrong-distribution regressions of the frac/floor class).
    opts_s = dataclasses.replace(opts32, sampler="stratified")
    img_s = np.asarray(pk.render_image_pallas(
        scene, dcam, 256, 64, 32, k7, opts_s
    ))
    orig = pk._pick_chunk_spp
    try:
        pk._pick_chunk_spp = lambda spp, *args, **kw: min(spp, 13)
        img_s_split = np.asarray(pk.render_image_pallas(
            scene, dcam, 256, 64, 32, k7, opts_s
        ))
    finally:
        pk._pick_chunk_spp = orig
    chunk_max = float(np.abs(img_s - img_s_split).max())
    mad_s = float(np.nanmean(np.abs(img_s - imgp)))
    check(
        "stratified",
        chunk_max < 1e-6 and mad_s < 0.025,
        f"(chunk maxdiff {chunk_max:.2e}, mean|d| vs random {mad_s:.4f})",
    )

    # 6. gathered cluster scan — now the PRODUCTION DEFAULT (round-5:
    # cluster_scan='auto' after the round-4 device ADOPT), so this is a
    # real gate: per-lane tpu.dynamic_gather + bounce-done-masked
    # regeneration must reproduce the flat scan BITWISE on hardware
    # (catches Mosaic lowering/numerics divergence in the gather, the
    # lexicographic extract, and the banked winner fetch), and the
    # EXACT segment accounting (pallas_kernel._seg_pair int32 totals,
    # round-5) must report cluster == flat — variants sweep both
    # extract shapes (cpi 1/2) on the production box bounds plus one
    # sphere-bounds row.
    for bounds, cpi in (("box", 1), ("box", 2), ("sphere", 2)):
        opts_cl = dataclasses.replace(
            opts32, cluster_scan=True, cluster_bounds=bounds,
            cluster_cpi=cpi,
        )
        try:
            img_cl, stats_cl = pk.render_image_pallas(
                scene, dcam, 256, 64, 32, k7, opts_cl, return_stats=True
            )
            img_cl = np.asarray(img_cl)
            segs_ok = float(stats_cl["segments"]) == float(
                stats_flat["segments"]
            )
            ok_cl = bool(np.array_equal(img_cl, imgp)) and segs_ok
            detail = (
                f"(maxdiff {np.abs(img_cl - imgp).max():.2e}, segs "
                f"{float(stats_cl['segments']):.0f}/"
                f"{float(stats_flat['segments']):.0f})"
            )
        except Exception as e:  # lowering/compile failure is the finding
            ok_cl = False
            detail = f"({type(e).__name__}: {str(e)[:120]})"
        check(f"cluster-scan-{bounds}-cpi{cpi}", ok_cl, detail)

    if FAILURES:
        print(f"[device-check] FAILED: {', '.join(FAILURES)}")
        return 1
    print("[device-check] all green")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
