"""Size the gathered cluster scan: per-segment cluster-hit statistics.

Round-4 design driver. Mosaic (jax 0.9.0) lowers same-shape
``take_along_axis`` to ``tpu.dynamic_gather``, enabling a PER-LANE
cluster scan: test all K cluster bounds on sublanes (broad phase), then
loop "extract this lane's nearest untested hit cluster → gather its
``group`` members' params → exact-test them" until every lane's list is
empty, pruning each step against the shrinking best-hit distance. The
per-iteration while trip count is the ROW MAX of per-lane tested-cluster
counts, so the win depends on the measured DISTRIBUTION (not just the
mean) of tested clusters per segment — which this script measures on
real segment populations (every live (origin, direction) per bounce from
the jnp tracer on the cover scene, Russian roulette on, CPU).

Per (cell_size, group) partition (scene/accel.py build_grid_clustered):

- ``hit``: clusters whose bound the ray hits at t >= MIN_T (no pruning);
- ``pruned``: + bound-entry must precede the best GLOBAL-sphere hit
  (globals = ground + big spheres, always exact-tested first);
- ``tested``: sequential model — clusters visited in bound-entry order,
  stopping when the next entry exceeds the running best exact hit
  (what the kernel's re-pruned extract-min loop actually pays);
- E[max over 128] / E[max over 1024]: expected while-loop trips for a
  row / tile of randomly mixed segments (regeneration + pixel sorting
  mix bounce depths, so random mixing is the right model);
- projected el-ops/segment and speedup vs the flat 488-slot scan from
  the static op model in the round-3 roofline (PERF.md).

Run (CPU, ~2-4 min): python scripts/measure_cluster_hits.py
Env: MCH_W/MCH_H (default 600x400), MCH_SPP (2), MCH_DEPTH (20),
MCH_CONFIGS ("2.0:8,2.0:16,3.0:16,4.0:16,3.0:8,6.0:16").
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.camera.camera import derive_camera, generate_rays, pixel_st_grid
from raytracer_tpu.core import sampling, vec
from raytracer_tpu.render.options import MIN_T, TraceOptions
from raytracer_tpu.render import tracer
from raytracer_tpu.scene import presets
from raytracer_tpu.scene.accel import build_grid_clustered


def capture_segments(width, height, spp, depth, rr_depth=5, seed=0):
    """All live (origin, direction) pairs per bounce, cover scene.

    Mirrors trace_rays' body (same keys, same RR) but as a Python loop
    that snapshots the live segment population entering each scan."""
    scene, cam, *_ = presets.get_config("cover", width, height)
    dcam = derive_camera(cam)
    st = pixel_st_grid(width, height).reshape(-1, 2)
    opts = TraceOptions(max_depth=depth, russian_roulette_depth=rr_depth)
    key = jax.random.PRNGKey(seed)

    os_, ds_, bounce_ids = [], [], []
    for s in range(spp):
        skey = jax.random.fold_in(key, s)
        ray = generate_rays(dcam, st, skey, width, height)
        o, d = ray.origin, ray.direction
        color = jnp.ones((st.shape[0], 3), jnp.float32)
        alive = jnp.ones((st.shape[0],), bool)
        for i in range(depth):
            bkey = jax.random.fold_in(skey, i)
            m = np.asarray(alive)
            if not m.any():
                break
            os_.append(np.asarray(o, np.float64)[m])
            ds_.append(np.asarray(d, np.float64)[m])
            bounce_ids.append(np.full(int(m.sum()), i, np.int32))
            rec = tracer.hit_world(o, d, scene)
            live_hit = alive & rec.hit
            did_scatter, att, new_dir = tracer.scatter(d, rec, bkey, opts)
            scat = live_hit & did_scatter
            color = jnp.where(scat[..., None], color * att, color)
            o = jnp.where(scat[..., None], rec.point, o)
            d = jnp.where(scat[..., None], new_dir, d)
            if rr_depth > 0:
                p_surv = jnp.clip(jnp.max(color, axis=-1), 0.05, 1.0)
                u = jax.random.uniform(
                    jax.random.fold_in(bkey, 7), p_surv.shape
                )
                roll = i >= rr_depth
                survive = jnp.where(roll, u < p_surv, True)
                scat = scat & survive
            alive = scat
    return (
        scene,
        np.concatenate(os_),
        np.concatenate(ds_),
        np.concatenate(bounce_ids),
    )


def ray_sphere_entry(o, d, centers, radii):
    """Per (ray, sphere): does the ray (t >= MIN_T) hit, and entry t.

    o, d: (N,3); centers: (K,3); radii: (K,). Returns hit (N,K) bool and
    t_entry (N,K) = max(t_near, MIN_T) where hit, +inf otherwise."""
    a = np.einsum("nd,nd->n", d, d)[:, None]  # (N,1)
    oc = o[:, None, :] - centers[None, :, :]  # (N,K,3)
    half_b = np.einsum("nkd,nd->nk", oc, d)
    c = np.einsum("nkd,nkd->nk", oc, oc) - radii[None, :] ** 2
    disc = half_b * half_b - a * c
    ok = disc >= 0.0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t_near = (-half_b - sq) / a
    t_far = (-half_b + sq) / a
    hit = ok & (t_far >= MIN_T)
    t_entry = np.where(hit, np.maximum(t_near, MIN_T), np.inf)
    return hit, t_entry


def ray_box_entry(o, d, lo, hi):
    """Per (ray, box): slab test. lo, hi: (K,3). Returns hit (N,K) and
    t_entry (N,K) = max(t_near, MIN_T) where hit, +inf otherwise.

    Models a per-cluster AABB broad phase: the cover's small spheres sit
    in a thin slab over the ground plane, so grid-cell AABBs (~cell x
    ~1.4 x cell) are far tighter than their bounding spheres (radius ~
    half the cell diagonal + member radius) for near-horizontal rays.
    In-kernel cost ~25 el-ops/box (invd amortized per iteration) vs the
    sphere bound's 18 — the model prices that via MCH_BROAD_OPS."""
    invd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)  # (N,3)
    t1 = (lo[None, :, :] - o[:, None, :]) * invd[:, None, :]  # (N,K,3)
    t2 = (hi[None, :, :] - o[:, None, :]) * invd[:, None, :]
    tn = np.minimum(t1, t2).max(axis=2)
    tf = np.maximum(t1, t2).min(axis=2)
    hit = (tf >= np.maximum(tn, MIN_T)) & (tf >= MIN_T)
    t_entry = np.where(hit, np.maximum(tn, MIN_T), np.inf)
    return hit, t_entry


def exact_best_t(o, d, centers, radii, active):
    """Reference closest-hit t per ray over the given spheres (near root,
    far-root fallback — tracer.hit_world semantics), +inf on miss."""
    a = np.einsum("nd,nd->n", d, d)[:, None]
    oc = o[:, None, :] - centers[None, :, :]
    half_b = np.einsum("nkd,nd->nk", oc, d)
    c = np.einsum("nkd,nkd->nk", oc, oc) - radii[None, :] ** 2
    disc = half_b * half_b - a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    near = (-half_b - sq) / a
    far = (-half_b + sq) / a
    root = np.where(near >= MIN_T, near, far)
    valid = (disc >= 0.0) & (root >= MIN_T) & active[None, :]
    t = np.where(valid, root, np.inf)
    return t.min(axis=1)


def expected_max(counts, n, draws=2000, rng=None):
    """E[max of n iid draws] from the empirical distribution."""
    rng = rng or np.random.default_rng(0)
    idx = rng.integers(0, len(counts), size=(draws, n))
    return float(counts[idx].max(axis=1).mean())


#: static el-op model (per ray), constants from the round-3 roofline:
#: flat scan 19.1 ops/slot average (split scan), broad bound test ~18,
#: extract step ~4.5 ops on (K,128), gather fetch 4 geometry params +
#: exact test ~21/“member”, winner fetch ~10 params
def elops_model(k_pad, group, n_global, trips):
    """Nested-while design: trips = TILE MAX of tested counts (all lanes
    wait out the worst lane's cluster list every bounce)."""
    broad = 18.0 * k_pad
    glob = 21.0 * n_global
    step = 4.5 * k_pad + (4.0 + 21.0) * group + 30.0
    winner = 10.0 * (group + 4)
    return broad + glob + trips * step + winner


def elops_regen_model(
    k_pad, group, n_global, iters_mean, cpi=1, broad_ops=18.0
):
    """Regeneration-integrated design: ONE cluster-step per loop
    iteration; a lane whose list empties scatters + starts its next
    bounce in place. Per-lane variance is absorbed exactly like path
    length already is, so cost scales with the MEAN iterations per
    segment — the price is the per-iteration fixed work (scatter, RNG,
    raygen, accumulators ~ the roofline's measured 21% non-scan share ≈
    1500-2500 el-ops) plus the broad phase re-running every iteration
    (SIMD: mid-list lanes pay it even though only regenerating lanes
    need it).

    ``cpi`` = clusters tested per iteration: each iteration extracts the
    cpi nearest unvisited clusters (cpi masked argmin passes) and exact-
    tests group*cpi gathered members. Fixed + broad-phase work amortizes
    over cpi clusters, trading member-test over-fetch (lanes with fewer
    remaining clusters than cpi still pay the full gather) for fewer
    iterations — the caller passes iters_mean already computed as
    mean(max(ceil(tested/cpi), 1))."""
    fixed = 1800.0
    step = (
        broad_ops * k_pad     # broad bounds (every iteration)
        + 21.0 * n_global     # globals (every iteration)
        + 4.5 * k_pad * cpi   # extract nearest unvisited, cpi times
        + (4.0 + 21.0) * group * cpi  # gather fetch + exact member test
        + 30.0 * cpi          # best-hit update
        + fixed
    )
    winner = 10.0 * (group + 4)
    return iters_mean * step + winner


FLAT_ELOPS = 9336.0   # measured static scan count, PERF.md roofline
FLAT_TOTAL = 11818.0  # + the measured 21% non-scan share


def main():
    w = int(_os.environ.get("MCH_W", "600"))
    h = int(_os.environ.get("MCH_H", "400"))
    spp = int(_os.environ.get("MCH_SPP", "2"))
    depth = int(_os.environ.get("MCH_DEPTH", "20"))
    cfgs = [
        (float(c.split(":")[0]), int(c.split(":")[1]))
        for c in _os.environ.get(
            "MCH_CONFIGS", "2.0:8,2.0:16,3.0:16,4.0:16,3.0:8,6.0:16"
        ).split(",")
    ]
    print(f"capturing segments: cover {w}x{h} spp={spp} depth={depth} rr5")
    scene, o, d, bounce = capture_segments(w, h, spp, depth)
    n = len(o)
    print(f"{n} segments ({(bounce == 0).mean():.1%} primary)")

    centers = np.asarray(scene.center, np.float64)
    radii = np.abs(np.asarray(scene.radius, np.float64))
    active = np.asarray(scene.active) > 0.0

    # subsample for the N x K analysis if huge
    cap = int(_os.environ.get("MCH_CAP", "400000"))
    rng = np.random.default_rng(1)
    if n > cap:
        pick = rng.choice(n, cap, replace=False)
        o, d, bounce = o[pick], d[pick], bounce[pick]
        n = cap

    for cell, group in cfgs:
        g = build_grid_clustered(scene, cell_size=cell, group=group)
        b = np.asarray(g.bounds, np.float64)
        k = b.shape[0]
        uuid = np.asarray(g.uuid)
        gc = np.asarray(g.scene.center, np.float64)
        gr = np.abs(np.asarray(g.scene.radius, np.float64))
        gact = uuid >= 0

        # globals: exact best t (the kernel tests them broadcast first)
        t_glob = exact_best_t(
            o, d, gc[: g.n_global], gr[: g.n_global], gact[: g.n_global]
        )

        # exact per-cluster best t (for the sequential tested model)
        csl = gc[g.n_global:].reshape(k, group, 3)
        rsl = gr[g.n_global:].reshape(k, group)
        asl = gact[g.n_global:].reshape(k, group)
        t_cl = np.full((n, k), np.inf)
        chunk = 100_000
        for i0 in range(0, n, chunk):
            sl = slice(i0, min(i0 + chunk, n))
            for ci in range(k):
                if not asl[ci].any():
                    continue
                t_cl[sl, ci] = exact_best_t(
                    o[sl], d[sl], csl[ci], rsl[ci], asl[ci]
                )

        # per-cluster AABBs over active members (degenerate = never hit)
        lo = np.full((k, 3), np.inf)
        hi = np.full((k, 3), -np.inf)
        for ci in range(k):
            if not asl[ci].any():
                continue
            lo[ci] = (csl[ci][asl[ci]] - rsl[ci][asl[ci], None]).min(axis=0)
            hi[ci] = (csl[ci][asl[ci]] + rsl[ci][asl[ci], None]).max(axis=0)

        k_pad = -(-k // 8) * 8
        bound_kinds = [
            ("sphere", ray_sphere_entry(o, d, b[:, :3], b[:, 3]), 18.0),
            (
                "box",
                ray_box_entry(o, d, lo, hi),
                float(_os.environ.get("MCH_BROAD_OPS_BOX", "25")),
            ),
        ]
        print(
            f"cell={cell} group={group}: K={k} (pad {k_pad}) "
            f"globals={g.n_global} slots={len(uuid)}"
        )
        for bname, (hit, t_entry), broad_ops in bound_kinds:
            n_hit = hit.sum(axis=1)
            n_pruned = (hit & (t_entry <= t_glob[:, None])).sum(axis=1)

            # sequential model: visit hit clusters in t_entry order, stop
            # when the next entry exceeds the running best
            order = np.argsort(t_entry, axis=1)
            te_sorted = np.take_along_axis(t_entry, order, axis=1)
            tc_sorted = np.take_along_axis(t_cl, order, axis=1)
            best = t_glob.copy()
            tested = np.zeros(n, np.int64)
            for j in range(k):
                # finite-entry check: a non-hit cluster (te = inf) is
                # never visited even when best = inf (total miss)
                visit = np.isfinite(te_sorted[:, j]) & (
                    te_sorted[:, j] <= best
                )
                tested += visit
                best = np.where(
                    visit, np.minimum(best, tc_sorted[:, j]), best
                )
            counts = tested

            e128 = expected_max(counts, 128, rng=rng)
            e1024 = expected_max(counts, 1024, rng=rng)
            el = elops_model(k_pad, group, g.n_global, e1024)
            print(
                f" [{bname}] bound-hit mean {n_hit.mean():.2f}  p90 "
                f"{np.percentile(n_hit, 90):.0f}  max {n_hit.max()}  |  "
                f"glob-pruned mean {n_pruned.mean():.2f}\n"
                f" [{bname}] tested mean {counts.mean():.2f}  p90 "
                f"{np.percentile(counts, 90):.0f}  p99 "
                f"{np.percentile(counts, 99):.0f}  max {counts.max()}  "
                f"E[max/128] {e128:.1f}  E[max/1024] {e1024:.1f}\n"
                f" [{bname}] nested-while: ~{el:.0f} el-ops vs flat "
                f"{FLAT_ELOPS:.0f} scan -> op cut {FLAT_ELOPS / el:.2f}x"
            )
            # regeneration-integrated: a 0-cluster bounce still takes one
            # iteration (scatter + regen happen in it); with cpi clusters
            # per iteration a lane needs ceil(tested/cpi) iterations
            for cpi in [
                int(c)
                for c in _os.environ.get("MCH_CPI", "1,2,3").split(",")
            ]:
                iters = np.maximum(-(-counts // cpi), 1).mean()
                el_r = elops_regen_model(
                    k_pad, group, g.n_global, iters, cpi, broad_ops
                )
                print(
                    f" [{bname}] regen-step cpi={cpi}: iters/segment "
                    f"{iters:.2f}  ~{el_r:.0f} el-ops vs flat TOTAL "
                    f"{FLAT_TOTAL:.0f} -> projected speedup "
                    f"{FLAT_TOTAL / el_r:.2f}x"
                )


if __name__ == "__main__":
    main()
