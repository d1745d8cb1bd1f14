"""Host-side sizing study for the per-row candidate-window kernel (round 2).

Simulates the cover scene's ray population bounce by bounce with the jnp
tracer and measures, for each 128-ray kernel row, how many x-sorted
8-sphere groups the row's in-layer segment extent spans. This sizes the
static window width W_g and the full-scan fallback rate before any Pallas
work is committed (PERF.md roadmap: measure, don't guess).

Partition model measured here (1-D x-slab variant):
- "global" spheres (|r| > 0.5) are always scanned (ground + 3 heroes);
- small spheres sorted by center.x, chunked into groups of 8, each group
  with a conservative x-interval [min(cx-r), max(cx+r)];
- per ray: segment t-range = [MIN_T, t_hit_global] clamped to the y-slab
  of the small-sphere layer; the x-extent of that segment picks the
  contiguous group range; a row takes the union over its live rays.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from raytracer_tpu.camera import camera as cam_mod  # noqa: E402
from raytracer_tpu.render import tracer  # noqa: E402
from raytracer_tpu.render.options import MAX_T, MIN_T, TraceOptions  # noqa: E402
from raytracer_tpu.scene import presets  # noqa: E402
from raytracer_tpu.scene.spheres import Scene  # noqa: E402

WIDTH, HEIGHT = 1152, 800  # multiple of 128 so rows map exactly to lanes
MAX_DEPTH = 10
BIG_RADIUS = 0.5
GROUP = 8


def subscene(scene, mask):
    return Scene(
        center=scene.center[mask],
        radius=scene.radius[mask],
        material_type=scene.material_type[mask],
        albedo=scene.albedo[mask],
        fuzz=scene.fuzz[mask],
        refraction_index=scene.refraction_index[mask],
        active=scene.active[mask],
    )


def main():
    scene, cam_cfg, *_ = presets.get_config("cover", WIDTH, HEIGHT)
    dcam = cam_mod.derive_camera(cam_cfg)
    opts = TraceOptions(max_depth=MAX_DEPTH, cluster_scan=False)

    centers = np.asarray(scene.center)
    radii = np.asarray(scene.radius)
    active = np.asarray(scene.active) > 0
    big = (np.abs(radii) > BIG_RADIUS) & active
    small = active & ~big
    print(f"spheres: {active.sum()} active = {big.sum()} global + {small.sum()} small")

    # y-slab of the small layer
    y0 = float((centers[small, 1] - np.abs(radii[small])).min())
    y1 = float((centers[small, 1] + np.abs(radii[small])).max())
    print(f"y-slab: [{y0:.3f}, {y1:.3f}]")

    # x-sorted groups of 8
    sidx = np.where(small)[0][np.argsort(centers[small, 0], kind="stable")]
    n_small = len(sidx)
    n_groups = -(-n_small // GROUP)
    glo = np.full(n_groups, np.inf)
    ghi = np.full(n_groups, -np.inf)
    for g in range(n_groups):
        mem = sidx[g * GROUP : (g + 1) * GROUP]
        glo[g] = (centers[mem, 0] - np.abs(radii[mem])).min()
        ghi[g] = (centers[mem, 0] + np.abs(radii[mem])).max()
    # searchsorted requires monotone arrays; group min/max extents can
    # locally invert when neighboring boundaries are closer than a radius,
    # so use the conservative monotone envelopes
    ghi = np.maximum.accumulate(ghi)
    glo = np.minimum.accumulate(glo[::-1])[::-1]
    print(f"groups: {n_groups} (x spans {glo.min():.1f}..{ghi.max():.1f}; "
          f"mean width {np.mean(ghi - glo):.2f})")

    big_scene = subscene(scene, jnp.asarray(big))

    st = cam_mod.pixel_st_grid(WIDTH, HEIGHT).reshape(-1, 2)
    key = jax.random.PRNGKey(0)
    rays = cam_mod.generate_rays(dcam, st, key, WIDTH, HEIGHT)
    O = np.asarray(rays.origin, np.float64)
    D = np.asarray(rays.direction, np.float64)
    alive = np.ones(O.shape[0], bool)

    n_rows = (HEIGHT * WIDTH) // 128
    wg_budgets = [6, 8, 10, 12, 16, 20, 24, 32]
    stats = []  # (bounce, live_frac, mean_len, p50, p95, p99, max, fallback%)

    hit_jit = jax.jit(lambda o, d, s: tracer.hit_world(o, d, s))
    scat_jit = jax.jit(
        lambda d, rec, k: tracer.scatter(d, rec, k, opts)
    )

    rng = jax.random.PRNGKey(42)
    for bounce in range(MAX_DEPTH):
        if alive.sum() == 0:
            break
        # t of the nearest GLOBAL hit (the only t known before the window)
        rec_g = hit_jit(jnp.asarray(O, jnp.float32), jnp.asarray(D, jnp.float32),
                        big_scene)
        t_glob = np.where(np.asarray(rec_g.hit), np.asarray(rec_g.t, np.float64),
                          MAX_T)

        # segment ∩ y-slab
        oy, dy = O[:, 1], D[:, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = (y0 - oy) / dy
            tb = (y1 - oy) / dy
        t_in = np.minimum(ta, tb)
        t_out = np.maximum(ta, tb)
        par = np.abs(dy) < 1e-12
        inside = (oy >= y0) & (oy <= y1)
        t_in = np.where(par, np.where(inside, MIN_T, MAX_T), t_in)
        t_out = np.where(par, np.where(inside, MAX_T, -MAX_T), t_out)
        tlo = np.maximum(t_in, MIN_T)
        thi = np.minimum(t_out, t_glob)
        has_seg = alive & (thi >= tlo)

        xa = O[:, 0] + tlo * D[:, 0]
        xb = O[:, 0] + thi * D[:, 0]
        xmin = np.where(has_seg, np.minimum(xa, xb), np.inf)
        xmax = np.where(has_seg, np.maximum(xa, xb), -np.inf)

        # per-row union -> group range
        rx0 = xmin.reshape(n_rows, 128).min(axis=1)
        rx1 = xmax.reshape(n_rows, 128).max(axis=1)
        # first group with ghi >= rx0, last with glo <= rx1
        first = np.searchsorted(ghi, rx0, side="left")
        last = np.searchsorted(glo, rx1, side="right") - 1
        length = np.clip(last - first + 1, 0, None)
        live_rows = alive.reshape(n_rows, 128).any(axis=1)
        seg_rows = live_rows & (rx0 < np.inf)
        ln = length[live_rows]

        row = {
            "bounce": bounce,
            "live%": 100 * alive.mean(),
            "rows_with_seg%": 100 * seg_rows.sum() / max(live_rows.sum(), 1),
            "mean": ln.mean() if len(ln) else 0,
            "p50": np.percentile(ln, 50) if len(ln) else 0,
            "p95": np.percentile(ln, 95) if len(ln) else 0,
            "p99": np.percentile(ln, 99) if len(ln) else 0,
            "max": ln.max() if len(ln) else 0,
        }
        for w in wg_budgets:
            row[f">W{w}%"] = 100 * (ln > w).mean() if len(ln) else 0
        stats.append(row)

        # advance: full-scene hit + scatter
        rec = hit_jit(jnp.asarray(O, jnp.float32), jnp.asarray(D, jnp.float32),
                      scene)
        rng, k = jax.random.split(rng)
        did, _, nd = scat_jit(jnp.asarray(D, jnp.float32), rec, k)
        hitm = np.asarray(rec.hit)
        alive = alive & hitm & np.asarray(did)
        O = np.where(alive[:, None], np.asarray(rec.point, np.float64), O)
        D = np.where(alive[:, None], np.asarray(nd, np.float64), D)

    keys = list(stats[0].keys())
    print("  ".join(f"{k:>10}" for k in keys))
    for r in stats:
        print("  ".join(f"{r[k]:>10.2f}" if isinstance(r[k], float) else f"{r[k]:>10}"
                        for k in keys))

    # weighted fallback rate across all live row-bounces
    total = sum(r["live%"] for r in stats)
    for w in wg_budgets:
        fb = sum(r[f">W{w}%"] * r["live%"] for r in stats) / total
        # average scanned slots if len<=w else full scan (512 + window)
        print(f"W_g={w:3d}: weighted fallback {fb:5.2f}%")


if __name__ == "__main__":
    main()


def attribution():
    """Decompose the row-union blowup: origin spread vs segment length, and
    the per-ray ceiling. Also cell-count stats for 2-D gather designs."""
    scene, cam_cfg, *_ = presets.get_config("cover", WIDTH, HEIGHT)
    dcam = cam_mod.derive_camera(cam_cfg)
    opts = TraceOptions(max_depth=MAX_DEPTH, cluster_scan=False)

    centers = np.asarray(scene.center)
    radii = np.asarray(scene.radius)
    active = np.asarray(scene.active) > 0
    big = (np.abs(radii) > BIG_RADIUS) & active
    small = active & ~big
    y0 = float((centers[small, 1] - np.abs(radii[small])).min())
    y1 = float((centers[small, 1] + np.abs(radii[small])).max())
    sidx = np.where(small)[0][np.argsort(centers[small, 0], kind="stable")]
    n_groups = -(-len(sidx) // GROUP)
    glo = np.full(n_groups, np.inf)
    ghi = np.full(n_groups, -np.inf)
    for g in range(n_groups):
        mem = sidx[g * GROUP : (g + 1) * GROUP]
        glo[g] = (centers[mem, 0] - np.abs(radii[mem])).min()
        ghi[g] = (centers[mem, 0] + np.abs(radii[mem])).max()
    ghi = np.maximum.accumulate(ghi)  # monotone envelopes for searchsorted
    glo = np.minimum.accumulate(glo[::-1])[::-1]

    big_scene = subscene(scene, jnp.asarray(big))
    st = cam_mod.pixel_st_grid(WIDTH, HEIGHT).reshape(-1, 2)
    rays = cam_mod.generate_rays(dcam, st, jax.random.PRNGKey(0), WIDTH, HEIGHT)
    O = np.asarray(rays.origin, np.float64)
    D = np.asarray(rays.direction, np.float64)
    alive = np.ones(O.shape[0], bool)
    n_rows = (HEIGHT * WIDTH) // 128

    hit_jit = jax.jit(lambda o, d, s: tracer.hit_world(o, d, s))
    scat_jit = jax.jit(lambda d, rec, k: tracer.scatter(d, rec, k, opts))
    rng = jax.random.PRNGKey(42)

    hdr = ("bounce live% | per-ray: mean p95 | row cap=inf/4/2/1 | "
           "rowcells16 mean p95 | origin-x-spread mean")
    print(hdr)
    for bounce in range(6):
        if alive.sum() == 0:
            break
        rec_g = hit_jit(jnp.asarray(O, jnp.float32), jnp.asarray(D, jnp.float32),
                        big_scene)
        t_glob = np.where(np.asarray(rec_g.hit), np.asarray(rec_g.t, np.float64),
                          MAX_T)
        oy, dy = O[:, 1], D[:, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = (y0 - oy) / dy
            tb = (y1 - oy) / dy
        t_in, t_out = np.minimum(ta, tb), np.maximum(ta, tb)
        par = np.abs(dy) < 1e-12
        inside = (oy >= y0) & (oy <= y1)
        t_in = np.where(par, np.where(inside, MIN_T, MAX_T), t_in)
        t_out = np.where(par, np.where(inside, MAX_T, -MAX_T), t_out)
        tlo = np.maximum(t_in, MIN_T)

        # normalize by horizontal speed so caps are in world units
        dxz = np.sqrt(D[:, 0] ** 2 + D[:, 2] ** 2)

        def spans(cap_units):
            thi = np.minimum(t_out, t_glob)
            if cap_units is not None:
                with np.errstate(divide="ignore"):
                    thi = np.minimum(thi, tlo + cap_units / np.maximum(dxz, 1e-12))
            has = alive & (thi >= tlo)
            xa = O[:, 0] + tlo * D[:, 0]
            xb = O[:, 0] + thi * D[:, 0]
            xmin = np.where(has, np.minimum(xa, xb), np.inf)
            xmax = np.where(has, np.maximum(xa, xb), -np.inf)
            first = np.searchsorted(ghi, xmin, side="left")
            last = np.searchsorted(glo, xmax, side="right") - 1
            ln = np.clip(last - first + 1, 0, None)
            return xmin, xmax, ln, has

        xmin, xmax, ln_ray, has = spans(None)
        pr = ln_ray[alive]
        # row unions at various caps
        row_res = []
        for cap in [None, 4.0, 2.0, 1.0]:
            xmn, xmx, _, _ = spans(cap)
            rx0 = xmn.reshape(n_rows, 128).min(axis=1)
            rx1 = xmx.reshape(n_rows, 128).max(axis=1)
            first = np.searchsorted(ghi, rx0, side="left")
            last = np.searchsorted(glo, rx1, side="right") - 1
            lnr = np.clip(last - first + 1, 0, None)
            live_rows = alive.reshape(n_rows, 128).any(axis=1)
            row_res.append(lnr[live_rows].mean())

        # 2-D cell-set size per row (cells touched by any segment, sampled)
        CS = 2.0
        thi_f = np.minimum(t_out, t_glob)
        K = 24
        tsamp = tlo[:, None] + (thi_f - tlo)[:, None] * np.linspace(0, 1, K)[None]
        px = O[:, 0:1] + tsamp * D[:, 0:1]
        pz = O[:, 2:3] + tsamp * D[:, 2:3]
        cx = np.clip(np.floor(px / CS).astype(np.int64) + 8, 0, 15)
        cz = np.clip(np.floor(pz / CS).astype(np.int64) + 8, 0, 15)
        cid = cx * 16 + cz
        cid = np.where((alive & (thi_f >= tlo))[:, None], cid, -1)
        cells_per_row = np.zeros(n_rows)
        cidr = cid.reshape(n_rows, 128 * K)
        for r in range(n_rows):
            u = np.unique(cidr[r])
            cells_per_row[r] = (u >= 0).sum()
        live_rows = alive.reshape(n_rows, 128).any(axis=1)
        cpr = cells_per_row[live_rows]

        ox = np.where(alive, O[:, 0], np.nan).reshape(n_rows, 128)
        spread = np.nanmax(ox, axis=1) - np.nanmin(ox, axis=1)
        spread = spread[live_rows & np.isfinite(spread[: n_rows].reshape(-1))]

        print(f"b{bounce} {100*alive.mean():5.1f}% | ray {pr.mean():5.2f} "
              f"{np.percentile(pr,95):5.1f} | rows "
              + "/".join(f"{v:5.1f}" for v in row_res)
              + f" | cells {cpr.mean():5.1f} {np.percentile(cpr,95):5.1f}"
              + f" | oxspread {np.nanmean(spread):5.2f}")

        rec = hit_jit(jnp.asarray(O, jnp.float32), jnp.asarray(D, jnp.float32),
                      scene)
        rng, k = jax.random.split(rng)
        did, _, nd = scat_jit(jnp.asarray(D, jnp.float32), rec, k)
        alive = alive & np.asarray(rec.hit) & np.asarray(did)
        O = np.where(alive[:, None], np.asarray(rec.point, np.float64), O)
        D = np.where(alive[:, None], np.asarray(nd, np.float64), D)
