"""Benchmark harness: the BASELINE.md headline metric on real hardware.

Renders the RTiOW final cover scene (~480 spheres) at 1200x800, 500 spp,
depth 50 and reports Mrays/s (a "ray" = one live ray-bounce segment, counted
exactly on device). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/500}

vs_baseline is against the 500 Mrays/s target from BASELINE.json ("converged
in <2 s on one TPU chip at >500 Mrays/s").

Env knobs: BENCH_CONFIG ('cover' default; 'all' for the full matrix;
'progressive' for BASELINE config 4 — steady-state 1-spp frames at 1080p),
BENCH_SPP, BENCH_BACKEND, BENCH_REPEATS, BENCH_RR (Russian-roulette start
bounce; default 5, 0 = pure reference physics). When RR is on, an rr0
companion run is always reported (stderr + rr0_* JSON fields;
BENCH_SKIP_RR0=1 to skip). BENCH_CONVERGENCE=1 adds a device-side
full-spp mean-abs-diff check of the Pallas kernel against the
independent jnp tracer on a 304x200 crop; BENCH_CONVERGENCE=full runs
the whole frame (~30+ min ground-truth capture);
BENCH_CONVERGENCE=golden compares one fresh full-frame Pallas render
against the committed jnp rr0 ground truth (tests/goldens/, seconds). An adaptive-sampling
companion line runs by default at tol=0.2 (the BASELINE's "converged
in <2 s" framing reads off it); BENCH_ADAPTIVE sets the tolerance,
=0 disables, BENCH_ADAPTIVE_CHUNK overrides the chunk cap, and
BENCH_ADAPTIVE_SAMPLER (default stratified — measured same wall,
~1.3-1.6x lower error than random) picks its sampler; its mad
reference is a fixed-spp render of the SAME sampler.
BENCH_SAMPLER=stratified switches the headline's camera draws to the
R2 low-discrepancy sampler (same wall, lower variance; default random
so the headline stays comparable across rounds).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MRAYS = 500.0


def _cluster_opt(scene_count: int):
    """BENCH_CLUSTER: unset → 'auto' (the production default — the
    device-ADOPTED gathered cluster scan engages for scenes >= 64
    slots, so the plain headline run renders with it); '0' forces the
    flat scan (A/B baseline); any other value forces it on for
    eligible scenes (the legacy >= 64 gate keeps the matrix's tiny
    configs flat, where the broad phase is pure overhead)."""
    v = os.environ.get("BENCH_CLUSTER")
    if v is None:
        return "auto"
    return v != "0" and scene_count >= 64


def _bench_one(config, backend, repeats, spp_override=None):
    import time

    import jax
    import numpy as np

    from raytracer_tpu.render.api import render_image
    from raytracer_tpu.render.options import TraceOptions
    from raytracer_tpu.scene import presets

    scene, cam, w, h, spp, depth = presets.get_config(config)
    spp = spp_override or spp
    rr = int(os.environ.get("BENCH_RR", "5"))
    opts = TraceOptions(
        max_depth=depth, backend=backend, russian_roulette_depth=rr,
        scan_mxu=os.environ.get("BENCH_SCAN_MXU", "0") == "1",
        cluster_scan=_cluster_opt(scene.count),
        cluster_cpi=int(os.environ.get("BENCH_CLUSTER_CPI", "1")),
        cluster_bounds=os.environ.get("BENCH_CLUSTER_BOUNDS", "box"),
    )
    key = jax.random.PRNGKey(0)

    def run(k):
        img, stats = render_image(scene, cam, w, h, spp, k, opts, return_stats=True)
        np.asarray(img)
        return img, float(stats["segments"])

    run(key)  # warmup/compile
    best, segments = None, 0.0
    for i in range(repeats):
        t0 = time.perf_counter()
        _, segs_i = run(jax.random.fold_in(key, i))
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            # keep (wall, segments) from the SAME repeat: RR makes the
            # segment count key-dependent, so mixing repeats would report
            # a cross-run ratio no single run produced
            best, segments = dt, segs_i
    return w, h, spp, depth, best, segments


def _bench_progressive(config="demo", width=1920, height=1080,
                       frames=256, batch=32):
    """BASELINE config 4: realtime progressive 1 spp/frame at 1080p.
    Steady-state jitted step with buffer donation (the reference's primary
    use case, static/shader.frag:387-404 + src/state.rs:127-135 defaults).
    Frames are timed in batches with one scalar sync per batch — the
    viewer's consumption pattern. Returns the result dict."""
    import jax

    from raytracer_tpu.progressive.state import init_render_state
    from raytracer_tpu.progressive.step import make_step_fn
    from raytracer_tpu.render.options import DebugParams, TraceOptions
    from raytracer_tpu.scene import presets

    scene, cam, w, h, spp, depth = presets.get_config(
        config, width, height
    )
    opts = TraceOptions(max_depth=8)
    step = make_step_fn(w, h, spp=1, opts=opts,
                        backend=os.environ.get("BENCH_BACKEND", "auto"))
    state = init_render_state(w, h, jax.random.PRNGKey(0))
    debug = DebugParams.none()
    for _ in range(5):  # warm: compile + steady accumulation
        state, aux = step(state, scene, cam, debug)
    float(aux["segments"])  # sync (block_until_ready under-reports)
    best = None
    segs_frame = 0.0
    done = 0
    while done < frames:
        n = min(batch, frames - done)
        t0 = time.perf_counter()
        for _ in range(n):
            state, aux = step(state, scene, cam, debug)
        segs = float(aux["segments"])  # one ~60 ms sync per batch
        dt = (time.perf_counter() - t0) / n
        done += n
        if best is None or dt < best:
            best, segs_frame = dt, segs
    fps = 1.0 / best
    return {
        "metric": f"progressive_{config}_{w}x{h}_1spp_d8 fps",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": None,  # the reference publishes no number; see
        # BASELINE.md ("interactive rates" on a desktop GPU at <=1280px)
        "ms_per_frame": round(best * 1e3, 2),
        "frames": frames,
        "segments_per_frame": segs_frame,
        "backend": os.environ.get("BENCH_BACKEND", "auto"),
    }


def main() -> int:
    config = os.environ.get("BENCH_CONFIG", "cover")
    # best-of-3 by default: the first post-warmup call through the device
    # tunnel regularly carries 0.5-10 s of cold-stream straggler latency
    # (measured: 7.0 s first vs 6.4 s steady on the cover render)
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    # hang watchdog: a wedged device tunnel makes backend init HANG (not
    # error — observed: axon init blocking >4 h during an outage), which
    # would leave the capture with no JSON line at all. Emit the failure
    # line and hard-exit instead. Generous default — a fully-cold headline
    # run is up to 4 remote compiles at 10 s-14 min each, and
    # BENCH_CONVERGENCE=full adds ~30+ min.
    wd_s = float(os.environ.get("BENCH_WATCHDOG_S", "7200"))
    if wd_s > 0:
        import threading

        def _hang_abort():
            print(json.dumps({
                "metric": "cover Mrays/sec/chip", "value": 0.0,
                "unit": "Mrays/s", "vs_baseline": 0.0,
                "error": f"watchdog: no result within {wd_s:.0f}s "
                         "(device tunnel hang?)",
            }), flush=True)
            os._exit(3)

        _wd = threading.Timer(wd_s, _hang_abort)
        _wd.daemon = True
        _wd.start()

    # fast tunnel pre-probe: during an outage, backend init HANGS rather
    # than errors, and the in-process watchdog above only fires after its
    # full (deliberately generous) window. A SUBPROCESS probe detects the
    # hang in minutes instead — the child inits the backend; if it can't
    # answer within BENCH_PROBE_S (default 240 s ≫ healthy init ≈ 10-30 s;
    # 0 disables), emit the failure line now. A probe that ERRORS quickly
    # is deliberately ignored: the real run will surface the same error
    # with full context. Sequential with the parent's own device use, so
    # the one-TPU-process-at-a-time rule holds.
    probe_s = float(os.environ.get("BENCH_PROBE_S", "240"))
    if probe_s > 0:
        import subprocess
        import sys

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                timeout=probe_s, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({
                "metric": "cover Mrays/sec/chip", "value": 0.0,
                "unit": "Mrays/s", "vs_baseline": 0.0,
                "error": f"tunnel probe hung >{probe_s:.0f}s "
                         "(device tunnel outage)",
            }), flush=True)
            return 3

    if config == "progressive":
        # BASELINE config 4 as the headline JSON line
        try:
            from raytracer_tpu.utils.jaxcache import enable_persistent_cache

            enable_persistent_cache()
            result = _bench_progressive()
        except Exception as e:
            result = {
                "metric": "progressive_demo_1920x1080_1spp_d8 fps",
                "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}",
            }
            print(json.dumps(result))
            return 1
        print(json.dumps(result))
        return 0

    if config == "all":
        # full BASELINE matrix: per-config lines to stderr, headline last
        import jax

        from raytracer_tpu.utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()
        for name in ("two_sphere", "three_sphere", "dof", "cover"):
            try:
                w, h, spp, depth, wall, segs = _bench_one(name, backend, repeats)
                print(
                    f"{name}: {w}x{h} spp{spp} d{depth} wall={wall:.3f}s "
                    f"-> {segs/wall/1e6:.1f} Mrays/s",
                    file=sys.stderr,
                )
            except Exception as e:
                print(f"{name}: FAIL {e}", file=sys.stderr)
        try:
            # BASELINE config 4 (realtime progressive 1080p) — stderr line
            r = _bench_progressive()
            print(
                f"progressive: 1920x1080 1spp d8 "
                f"{r['ms_per_frame']:.1f} ms/frame -> {r['value']:.1f} fps",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"progressive: FAIL {e}", file=sys.stderr)
        config = "cover"  # fall through: headline JSON line

    try:
        import jax

        from raytracer_tpu.utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()

        from raytracer_tpu.render.api import render_image
        from raytracer_tpu.render.options import TraceOptions
        from raytracer_tpu.scene import presets

        scene, cam, w, h, spp, depth = presets.get_config(config)
        spp = int(os.environ.get("BENCH_SPP", spp))
        # unbiased Russian roulette from bounce 5 (BENCH_RR=0 to disable):
        # converges to the same image (measured mean |Δ| < 1e-4 at 100 spp)
        # while cutting the deep-tail stalls that dominate depth-50 renders
        rr = int(os.environ.get("BENCH_RR", "5"))
        # BENCH_SAMPLER=stratified: R2 camera sampling (same wall, lower
        # variance — PERF.md). Default random for headline comparability.
        opts = TraceOptions(
            max_depth=depth, backend=backend, russian_roulette_depth=rr,
            sampler=os.environ.get("BENCH_SAMPLER", "random"),
            # scan variants: the device-ADOPTED cluster scan is the
            # default ('auto' via _cluster_opt — the headline renders
            # with it); BENCH_CLUSTER=0 / BENCH_SCAN_MXU=1 are the A/B
            # knobs (scripts/bench_cluster.py / bench_scan_mxu.py)
            scan_mxu=os.environ.get("BENCH_SCAN_MXU", "0") == "1",
            cluster_scan=_cluster_opt(scene.count),
            cluster_cpi=int(os.environ.get("BENCH_CLUSTER_CPI", "1")),
            cluster_bounds=os.environ.get("BENCH_CLUSTER_BOUNDS", "box"),
        )
        key = jax.random.PRNGKey(0)

        import numpy as np

        def run(k):
            img, stats = render_image(
                scene, cam, w, h, spp, k, opts, return_stats=True
            )
            # force a device→host transfer: block_until_ready() can return
            # early through the TPU tunnel and under-report wall time
            np.asarray(img)
            return img, float(stats["segments"])

        # warmup / compile
        warm_spp_env = os.environ.get("BENCH_SKIP_WARMUP")
        if not warm_spp_env:
            run(key)

        best = None
        segments = 0.0
        for i in range(repeats):
            t0 = time.perf_counter()
            _, segs_i = run(jax.random.fold_in(key, i))
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, segments = dt, segs_i  # same-repeat (wall, segments)

        mrays = segments / best / 1e6
        result = {
            "metric": (
                f"{config}_{w}x{h}_spp{spp}_depth{depth}"
                + (f"_rr{rr}" if rr else "")
                + " Mrays/sec/chip"
            ),
            "value": round(mrays, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
            "wall_s": round(best, 3),
            "segments": segments,
            "backend": backend,
            "device": str(jax.devices()[0]),
        }

        if rr and not os.environ.get("BENCH_SKIP_RR0"):
            # honesty companion: the same render under pure reference
            # physics (no Russian roulette), so the headline's RR benefit
            # is always reported alongside, never hidden
            opts0 = TraceOptions(max_depth=depth, backend=backend)

            def run0(k):
                img, stats = render_image(
                    scene, cam, w, h, spp, k, opts0, return_stats=True
                )
                np.asarray(img)
                return img, float(stats["segments"])

            run0(key)
            t0 = time.perf_counter()
            _, segs0 = run0(jax.random.fold_in(key, 0))
            wall0 = time.perf_counter() - t0
            result["rr0_mrays"] = round(segs0 / wall0 / 1e6, 2)
            result["rr0_wall_s"] = round(wall0, 3)
            print(
                f"rr0 (pure reference physics): {segs0/wall0/1e6:.1f} "
                f"Mrays/s wall={wall0:.3f}s",
                file=sys.stderr,
            )

        # adaptive-sampling companion (never the headline): same render
        # with per-pixel early termination at the given 95%-CI tolerance;
        # reports wall, effective mean spp, and measured mean|Δ| vs this
        # run's fixed-spp image (VERDICT r2 #9). ON by default at
        # tol=0.2 — the BASELINE's own "converged in <2 s" framing reads
        # off this line (measured 1.9 s on the cover scene);
        # BENCH_ADAPTIVE=0 disables, any other value sets the tolerance.
        tol = float(os.environ.get("BENCH_ADAPTIVE", "0.2"))
        if tol > 0.0:
            import dataclasses

            # the companion defaults to the stratified sampler: measured
            # same wall as random with ~1.3-1.6x lower error vs its fixed
            # render (PERF.md adaptive x stratified matrix), so it is the
            # strictly better "converged in <2 s" witness. The mad
            # reference below always uses the SAME sampler so the number
            # isolates the early-termination error.
            sampler_a = os.environ.get("BENCH_ADAPTIVE_SAMPLER",
                                       "stratified")
            opts_a = dataclasses.replace(
                opts, adaptive_tolerance=tol,
                adaptive_chunk_spp=int(
                    os.environ.get("BENCH_ADAPTIVE_CHUNK", "0")
                ),
                sampler=sampler_a,
            )
            opts_ref = (opts if opts.sampler == sampler_a
                        else dataclasses.replace(opts, sampler=sampler_a))
            img_fixed, _ = render_image(
                scene, cam, w, h, spp, key, opts_ref, return_stats=True
            )
            img_fixed = np.asarray(img_fixed)

            def run_a(k):
                img, stats = render_image(
                    scene, cam, w, h, spp, k, opts_a, return_stats=True
                )
                np.asarray(img)
                return img, stats

            run_a(key)
            best_a, mspp, best_img = None, 0.0, None
            for i in range(repeats):
                t0 = time.perf_counter()
                img_a, stats_a = run_a(jax.random.fold_in(key, i))
                dt = time.perf_counter() - t0
                if best_a is None or dt < best_a:
                    # keep wall/mean_spp/image from the SAME repeat — the
                    # fold_in keys make each repeat a different render
                    best_a = dt
                    mspp = float(stats_a.get("mean_spp", spp))
                    best_img = np.asarray(img_a)
            mad_a = float(np.abs(best_img - img_fixed).mean())
            result["adaptive_tol"] = tol
            result["adaptive_sampler"] = sampler_a
            result["adaptive_wall_s"] = round(best_a, 3)
            result["adaptive_mean_spp"] = round(mspp, 1)
            result["adaptive_mad_vs_fixed"] = round(mad_a, 6)
            print(
                f"adaptive(tol={tol}, {sampler_a}): wall={best_a:.3f}s "
                f"mean_spp={mspp:.1f}/{spp} mean|Δ| vs fixed = {mad_a:.2e}",
                file=sys.stderr,
            )

        conv_mode = os.environ.get("BENCH_CONVERGENCE")
        if conv_mode == "golden" and (config != "cover" or spp != 500):
            # the committed golden IS the cover scene at 500 spp — a diff
            # against any other config/spp would record a plausible-
            # looking but meaningless number in the result JSON
            print(
                f"convergence: golden mode skipped — golden is "
                f"cover@500spp, bench is {config}@{spp}spp",
                file=sys.stderr,
            )
        elif conv_mode == "golden":
            # FULL-FRAME physics regression against the committed jnp rr0
            # ground truth (tests/goldens/, written by
            # scripts/capture_convergence.py): one fresh Pallas render vs
            # a stored independent-tracer image — the full 1200x800 check
            # at ~1/300th of the 'full' mode's device time. Expected
            # mean|Δ| ≈ 4.3e-3 (rr5-vs-rr0 + MC noise, CONVERGENCE_r03).
            golden = np.load(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tests", "goldens", "cover_jnp_rr0_500spp_f16.npz",
            ))["image"].astype(np.float64)
            hg, wg = golden.shape[:2]
            img_p, _ = render_image(
                scene, cam, wg, hg, spp, key, opts, return_stats=True
            )
            diff = np.abs(np.asarray(img_p, np.float64) - golden)
            n_nan = int(np.isnan(diff).sum())
            mad = float(np.nanmean(diff))
            result["convergence_mad_vs_golden"] = round(mad, 6)
            result["convergence_nan_px"] = n_nan
            print(
                f"convergence: pallas(rr{rr}) vs stored jnp(rr0) golden "
                f"@ {spp} spp mean|Δ|={mad:.2e} (nan px: {n_nan})",
                file=sys.stderr,
            )
            # ABSOLUTE certification of the adaptive companion (VERDICT r3
            # #3): adaptive_mad_vs_fixed above isolates early-termination
            # error against the SAME sampler's fixed render; this gates the
            # adaptive image against the independent jnp rr0 ground truth,
            # so the "<2 s converged" claim stands on the committed golden,
            # not on a same-family reference. Expected ≈ fixed-vs-golden
            # mad + adaptive error (~4.3e-3 + 4-7e-3 at tol 0.2).
            if tol > 0.0 and best_img is not None \
                    and best_img.shape == golden.shape:
                mad_ag = float(np.nanmean(np.abs(
                    best_img.astype(np.float64) - golden
                )))
                result["adaptive_golden_mad"] = round(mad_ag, 6)
                print(
                    f"convergence: adaptive(tol={tol}, {sampler_a}) vs "
                    f"stored jnp(rr0) golden mean|Δ|={mad_ag:.2e}",
                    file=sys.stderr,
                )
        elif conv_mode:
            # device-side convergence check at the full benchmark spp:
            # the Pallas kernel (with the benchmark's RR setting) against
            # the independent jnp wavefront tracer under reference physics
            import dataclasses

            # BENCH_CONVERGENCE=1 is the routine 304x200 crop gate;
            # BENCH_CONVERGENCE=full runs the full-frame jnp reference
            # (now possible — the jnp path row-bands its executions under
            # the device watchdog budget, VERDICT r2 #6 — but ~30+ min on
            # one chip: a ground-truth capture, not a routine gate; see
            # scripts/capture_convergence.py / CONVERGENCE_r03.json).
            if conv_mode == "full":
                wc, hc = w, h
            else:
                wc, hc = min(w, 304), min(h, 200)
            img_p, _ = render_image(
                scene, cam, wc, hc, spp, key, opts, return_stats=True
            )
            # jnp reference in spp chunks, linear accumulation, gamma once
            opts_j = dataclasses.replace(
                opts, backend="jnp", russian_roulette_depth=0, gamma=False
            )
            lin = np.zeros((hc, wc, 3), np.float64)
            done = 0
            while done < spp:
                cs = min(10, spp - done)
                img_j, _ = render_image(
                    scene, cam, wc, hc, cs,
                    jax.random.fold_in(key, 1000 + done), opts_j,
                    return_stats=True,
                )
                lin += np.asarray(img_j, np.float64) * cs
                done += cs
            img_j = np.sqrt(np.maximum(lin / spp, 0.0))
            # the reference ships with the near-zero Lambertian guard
            # disabled (shader.frag:222-225): a degenerate scatter
            # direction NaNs that pixel — reference-faithful, ~1 in 1e7
            # samples; exclude those pixels and report the count
            diff = np.abs(np.asarray(img_p, np.float64) - img_j)
            n_nan = int(np.isnan(diff).sum())
            mad = float(np.nanmean(diff))
            result["convergence_mad_vs_jnp"] = round(mad, 6)
            result["convergence_nan_px"] = n_nan
            print(
                f"convergence: pallas(rr{rr}) vs jnp(rr0) @ {spp} spp "
                f"mean|Δ|={mad:.2e} (nan px excluded: {n_nan})",
                file=sys.stderr,
            )
    except Exception as e:  # the driver needs a JSON line even on failure
        result = {
            "metric": "cover Mrays/sec/chip",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }
        print(json.dumps(result))
        return 1

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
