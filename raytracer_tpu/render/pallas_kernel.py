"""Pallas TPU megakernel: the whole per-pixel path tracer in one kernel.

This is the TPU-native re-creation of static/shader.frag as a single fused
kernel: camera ray-gen (shader.frag:342-351), the spp loop (360-383), the
bounce loop (297-339), closest-hit sphere scan (136-196), branch-free
materials (210-286), sky miss (289-294), and spp-average + sqrt gamma
(376-380) — all executed per image tile without ever leaving VMEM.

Design notes (vs. both the GLSL kernel and the plain-jnp tracer):

- Grid over pixel tiles of (K_SLOTS·R_SUB, 128) pixels; each kernel
  instance owns the tile and runs all spp samples and bounces for it.
  Ray state is SoA f32 registers (ox, oy, oz, dx, ...), never (N, 3)
  arrays, so every op is a full-width VPU op.
- ONE ``while_loop`` serves every (sample, bounce, pixel) of the tile
  with PATH REGENERATION: a lane whose path terminates (sky/absorb/RR/
  depth) folds its contribution into its pixel's accumulator and
  immediately starts its next sample in place — and, when its samples run
  out, its next pixel (K-SLOT VIRTUAL TILES: each lane walks K pixels, so
  its total work averages K independent path costs and the tile's
  max-lane wait concentrates toward the mean). The vector unit always
  runs near-full of live rays. This is the TPU analog of SIMT occupancy —
  the GLSL kernel's per-thread ``return`` (shader.frag:310/328/334)
  becomes per-lane masks, and the fixed-width penalty of waiting out the
  deepest of 1024 lanes per sample (live fraction measured
  100/85/37/20/11 % at bounces 0-4 on the cover scene) disappears. RNG
  counters per (pixel, sample, bounce) are unchanged, so the image is
  bitwise-identical to a per-sample loop at every K.
- The closest-hit scan is vectorized over BOTH rays and spheres: the scene
  is a (S_pad, 12) VMEM column table, spheres broadcast on sublanes against
  each 128-ray lane row, and the closest hit is a sublane min-reduction —
  no scalar per-sphere loop anywhere. Precomputed per-sphere constants
  (|c|^2 - r^2, signed 1/r) cut the inner op count; the signed 1/r
  reproduces the negative-radius normal flip (shader.frag:170) for free.
- RNG is a counter-based integer hash (lowbias32) keyed on
  (pixel, frame/key, draw counter): bitwise deterministic, identical in
  interpret mode and on hardware, no sequential state like the reference's
  seed chain (shader.frag:11-36).
- Depth exhaustion follows ``opts.exhaust_black`` (shader.frag:338 quirk),
  and the near-zero Lambertian guard follows ``opts.near_zero_guard``
  (shader.frag:222-225), like the jnp tracer.

The debug overlay (cursor marker / selection outline, shader.frag:306-318)
runs IN the kernel when ``opts.enable_debug``: uniforms ride the SMEM
table (slots 19-22), the winner's uuid rides row 11 of the gather table,
and the overlay is two masked selects in the bounce body — interactive
debugging runs at kernel speed. The AOV images (normal/depth/uuid/front)
remain on the jnp tracer (render/debug.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.camera.camera import DerivedCamera
from raytracer_tpu.core.sampling import (
    R2_ALPHAS_4D,
    R2_ALPHAS_B0,
    alphas_fixed32,
)
from raytracer_tpu.render.options import (
    MAX_T,
    MIN_T,
    TraceOptions,
    cluster_scan_enabled,
)
from raytracer_tpu.scene.spheres import Scene

LANES = 128
DEFAULT_R_SUB = 8  # 8 rows x 128 lanes = 1024 rays per grid step
#: SMEM uniform slot where the cluster scan's GLOBAL sphere params start
#: (4 scalars [cx, cy, cz, k1] per global, after the 32 camera/debug
#: slots of _camera_uniforms)
_UNI_GLOBALS = 32

TWO_PI = 6.2831853071795864
INV_24 = 1.0 / 16777216.0  # 2^-24
#: stratified-sampler alphas as 32-bit fixed-point integers (the exact
#: representation _r2_fixed consumes; shared with core/sampling.r2_point)
_A4_FIX = alphas_fixed32(R2_ALPHAS_4D)
_AB0_FIX = alphas_fixed32(R2_ALPHAS_B0)


# --- counter-based in-kernel RNG --------------------------------------------


def _lowbias32(x):
    """lowbias32 integer hash (public constants by W. Hash prospector):
    high-quality 32-bit mix with fixed shifts (vectorizes on the VPU)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _hash32(pix: jnp.ndarray, ctr, salt: int):
    """The raw 32-bit hash stream: hash(pixel ⊕ golden·(ctr+salt))."""
    c = (jnp.uint32(ctr) + jnp.uint32(salt)) * jnp.uint32(0x9E3779B9)
    return _lowbias32(pix ^ c)


def _to_u01(h):
    """Top 24 bits of a uint32 → f32 in [0,1). Mosaic has no uint32→f32
    cast; the 24-bit value fits a positive int32, so bitcast then
    convert."""
    h24 = jax.lax.bitcast_convert_type(h >> jnp.uint32(8), jnp.int32)
    return h24.astype(jnp.float32) * INV_24


def _u01(pix: jnp.ndarray, ctr, salt: int):
    """One uniform [0,1) draw per lane."""
    return _to_u01(_hash32(pix, ctr, salt))


def _r2_fixed(pix, rot, d: int, s_u, a_fix: int):
    """The s-th Kronecker point of dim ``d`` in 32-bit FIXED point: the
    per-pixel hash is the Cranley-Patterson rotation (full 32 bits) and
    frac(cp + s·alpha) becomes (cp_fix + s·a_fix) mod 2^32 — exact for
    every sample index, where the f32 recurrence quantizes once s·alpha
    outgrows the 24-bit mantissa (a stratified progressive session's
    draws would collapse onto ~128 levels by s ≈ 2^17). Same fixed-point
    construction as core/sampling.r2_point (alphas from the shared
    alphas_fixed32), but NOT bitwise-comparable streams: the host zeroes
    a rotation's low 8 bits (cp arrives as f32) while the kernel keeps
    the hash's full 32, so low-bit carries into bit 8 can differ by one
    2^-24 ulp — and the rotations themselves come from different RNGs."""
    x = _hash32(pix, rot, d) + s_u * jnp.uint32(a_fix)
    return _to_u01(x)


# --- small vector helpers over SoA triples -----------------------------------


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _unit_sphere(pix, ctr, salt):
    """random_in_unit_sphere, reference distribution (shader.frag:114-121)."""
    hx = _u01(pix, ctr, salt) * 2.0 - 1.0
    phi = _u01(pix, ctr, salt + 1) * TWO_PI
    # cbrt isn't lowered by Mosaic: u^(1/3) = exp(ln(u)/3), u ∈ [0,1)
    u = _u01(pix, ctr, salt + 2)
    r = jnp.exp(jnp.log(jnp.maximum(u, 1e-12)) * (1.0 / 3.0))
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - hx * hx))
    return r * s * jnp.sin(phi), r * s * jnp.cos(phi), r * hx


def _unit_vec(pix, ctr, salt):
    x, y, z = _unit_sphere(pix, ctr, salt)
    return _normalize3(x, y, z)


# --- the kernel ---------------------------------------------------------------


def _make_kernel(
    s_pad: int,
    spp: int,
    max_depth: int,
    r_sub: int,
    width: int,
    height: int,
    opts: TraceOptions,
    tiles_x: int,
    permuted: bool = False,
    k_slots: int = 1,
    g_full: int | None = None,
    adaptive: bool = False,
    cdims: tuple | None = None,
):
    # cdims = (K_pad, n_global, group, n_banks) switches the closest-hit
    # implementation to the GATHERED CLUSTER SCAN (see TraceOptions.
    # cluster_scan): one while-loop iteration = one cluster step, and the
    # scatter/terminate/regenerate tail runs under a bounce-done mask.
    cluster = cdims is not None
    if cluster:
        # group = winner-slot stride (real members per cluster); the
        # *_total variants >= their base run extra no-op work for the
        # cluster_pad_* cost probes (scripts/probe_cluster_slopes.py):
        # unhittable member slots, idempotent global re-tests, and
        # never-selected winner banks — none can change a result
        (k_pad_c, n_global, group, n_banks,
         group_total, n_global_total, n_banks_total) = cdims
    # slots [0, g_full) run the full near→far root fallback; slots beyond
    # are statically known to never contain a ray origin (see
    # _containable_split), so their far root is never the closest
    # legitimate hit — near-root-only saves 3 of ~24 scan ops per slot
    g_full = s_pad if g_full is None else min(g_full, s_pad)
    inv_w = 1.0 / width
    inv_h = 1.0 / height
    # draws per bounce: 7 material + safety; per sample: 4 camera + bounces
    draws_per_bounce = 8
    draws_per_sample = 4 + max_depth * draws_per_bounce
    wp = tiles_x * LANES
    # accumulator channels per pixel slot: rgb(3) + path cost(1), plus
    # sample count + luminance^2 sums when adaptive sampling is on (the
    # per-pixel variance that drives chunk-granular early termination)
    nacc = 6 if adaptive else 4

    dn = (((1,), (0,)), ((), ()))  # contract a.dim1 with b.dim0

    def kernel(uni_ref, seed_ref, *tables):
        if cluster:
            # bnd_ref: (K_pad, 4) cluster bounds [bcx, bcy, bcz, bk1]
            # mem_ref: (group·4, 8, 128) member params, lanes = cluster id
            # win_ref: (nw*n_banks, 8, 128) winner param banks by slot
            # (flat row = p*banks + b, the mem_ref-style layout)
            bnd_ref, mem_ref, win_ref, *rest = tables
        else:
            sph_ref, prm_ref, *rest = tables
        if opts.scan_mxu:
            # (2, S_pad, 4) A-matrices of the MXU scan offload
            mxt_ref, *rest = rest
        if permuted:
            pix_ref, out_ref, gat_ref = rest
        else:
            out_ref, gat_ref = rest
        # seed_ref: (3,) i32 = [hash seed, global sample offset, row offset]
        # prm_ref: (3, 16, S_pad) split-bf16 param table for the MXU gather
        # gat_ref: (16, r_sub, LANES) VMEM scratch — per-row gather results
        # land here so the per-param planes read back as canonical
        # (r_sub, LANES) tiles (ablation: the VPU masked-reduce gather was
        # ~45% of kernel time; one one-hot matmul per row replaces it)
        # camera uniforms (SMEM (32,) f32) — the descendant of the
        # reference's uniform ABI (src/webgl.rs:279-593)
        ox0, oy0, oz0 = uni_ref[0], uni_ref[1], uni_ref[2]
        llx, lly, llz = uni_ref[3], uni_ref[4], uni_ref[5]
        hx, hy, hz = uni_ref[6], uni_ref[7], uni_ref[8]
        vx, vy, vz = uni_ref[9], uni_ref[10], uni_ref[11]
        ux, uy, uz = uni_ref[12], uni_ref[13], uni_ref[14]
        vvx, vvy, vvz = uni_ref[15], uni_ref[16], uni_ref[17]
        lens_radius = uni_ref[18]

        t = pl.program_id(0)
        base_seed = seed_ref[0]
        sample_offset = seed_ref[1]
        # global pixel-row offset of this shard (0 single-chip; shard_map
        # passes rows_index * local_height so RNG streams and ray geometry
        # are IDENTICAL to the single-chip render at any mesh size)
        row_offset = seed_ref[2]

        if not cluster:
            # sphere SoA columns, (S_pad, 1) — sph_ref is a (S_pad, 12)
            # VMEM table; spheres broadcast along lanes against ray rows
            s_cx = sph_ref[:, 0:1]
            s_cy = sph_ref[:, 1:2]
            s_cz = sph_ref[:, 2:3]
            s_k1 = sph_ref[:, 3:4]   # |c|^2 - r^2

        zero = jnp.zeros((r_sub, LANES), jnp.float32)
        one = jnp.ones((r_sub, LANES), jnp.float32)

        # --- K-SLOT VIRTUAL TILES ----------------------------------------
        # Each lane owns k_slots pixels and walks them in order (all spp
        # samples of slot 0, then slot 1, ...) inside the ONE regeneration
        # while_loop. A lane's total work is the SUM of K pixels' path
        # costs, so the tile's max-lane wait concentrates toward the mean
        # (relative sample-noise shrinks ~1/sqrt(K)) — this attacks the
        # residual 15-25% tile imbalance that per-pixel cost sorting cannot
        # predict. Per-pixel RNG streams depend only on (ipx, ipy), so the
        # image is bitwise-identical for every K.
        if permuted:
            # profile-guided layout: the host assigns each lane arbitrary
            # pixels (expensive pixels packed into the same tiles so a
            # tile's max-lane wait ≈ its mean); everything downstream —
            # RNG hash, camera st, crop mask — derives from the same
            # (ipx, ipy), so per-pixel results are placement-independent
            pxk = [
                pix_ref[0, 0, k].astype(jnp.float32) for k in range(k_slots)
            ]
            pyk = [
                pix_ref[0, 1, k].astype(jnp.float32) for k in range(k_slots)
            ]
            if adaptive:
                # plane 2: per-lane remaining sample budget for each slot
                # (0 = the pixel is converged; the plan computes these
                # from the cumulative rgb/n/lum2 stats each chunk)
                budk = [
                    pix_ref[0, 2, k].astype(jnp.float32)
                    for k in range(k_slots)
                ]

            def pixel_xy(k_f):
                if k_slots == 1:
                    return pxk[0], pyk[0]
                # one-hot gather over the K slots (K cmp + 2K fma per call
                # — noise against the ~10k-op closest-hit scan)
                px = zero
                py = zero
                for k in range(k_slots):
                    m = (k_f == jnp.float32(k)).astype(jnp.float32)
                    px = px + m * pxk[k]
                    py = py + m * pyk[k]
                return px, py
        else:
            # RECTANGULAR tiles: each grid step owns a (k_slots·r_sub x
            # LANES)-pixel block — slot k is the k-th (r_sub x LANES) row
            # band — not a full-width strip; spatially compact tiles keep
            # the regeneration loop short where all pixels converge early
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (r_sub, LANES), 0)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r_sub, LANES), 1)
            px_const = ((t % tiles_x) * LANES + lane_ids).astype(jnp.float32)
            # local tile-row block j maps to absolute rows row_offset +
            # j·stride·block + [0, block): stride 1 = a contiguous band
            # (single chip / contiguous shard), stride N = the rows-mesh
            # round-robin block interleave (options.row_block_stride)
            base_py = (
                row_offset
                + (t // tiles_x)
                * (k_slots * r_sub * opts.row_block_stride)
                + row_ids
            ).astype(jnp.float32)

            def pixel_xy(k_f):
                if k_slots == 1:
                    return px_const, base_py
                return px_const, base_py + k_f * jnp.float32(r_sub)

        def pixel_state(k_f):
            """Current pixel of each lane: st coords, RNG hash, crop mask.

            Padding lanes (the 2-D tile grid rounds W/H up) are never
            alive, so they cost nothing, count nothing, and their output
            is cropped. Advancing k can only move a lane deeper into the
            padding suffix (rows grow with k in the rectangular layout;
            sorted layouts place zero-cost padding last), so a lane whose
            next slot is out of image is done for good."""
            px, py = pixel_xy(k_f)
            gid = py.astype(jnp.int32) * wp + px.astype(jnp.int32)
            # fold the frame/key seed into the pixel hash key
            pix = _lowbias32(gid.astype(jnp.uint32) ^ jnp.uint32(base_seed))
            in_img = jnp.logical_and(
                px < jnp.float32(width), py < jnp.float32(height)
            )
            return px, py, pix, in_img

        stratified = opts.sampler == "stratified"

        def gen_ray(s_f, px, py, pix):
            """Camera ray for per-lane sample index ``s_f`` (f32, exact int).

            Identical math and RNG counters to the per-sample generation of
            the pre-regeneration kernel: draws 0-3 of the sample's counter
            block (shader.frag:342-351, 365-369). With the stratified
            sampler those four camera draws are instead the (sample_offset
            + s)-th 4-D R2 point under a per-pixel Cranley-Patterson
            rotation (core/sampling.py): rotation counters -4..-1 are
            disjoint from every per-sample counter block (all >= 0), and
            bounce draws stay counter-hashed either way."""
            s_i = sample_offset + s_f.astype(jnp.int32)
            ctr0 = s_i * draws_per_sample
            if stratified:
                rot = jnp.uint32(0xFFFFFFFC)  # ctr -4: cp draws at -4..-1
                s_u = s_i.astype(jnp.uint32)

                def r2(d):
                    return _r2_fixed(pix, rot, d, s_u, _A4_FIX[d])

                u0, u1, u2, u3 = r2(0), r2(1), r2(2), r2(3)
            else:
                u0 = _u01(pix, ctr0, 0)
                u1 = _u01(pix, ctr0, 1)
                u2 = _u01(pix, ctr0, 2)
                u3 = _u01(pix, ctr0, 3)
            st_s = (px + 0.5 + u0) * inv_w
            st_t = (py + 0.5 + u1) * inv_h
            ang = u2 * TWO_PI
            rad = lens_radius * jnp.sqrt(u3)
            rdx = rad * jnp.cos(ang)
            rdy = rad * jnp.sin(ang)
            offx = ux * rdx + vvx * rdy
            offy = uy * rdx + vvy * rdy
            offz = uz * rdx + vvz * rdy
            ox = ox0 + offx
            oy = oy0 + offy
            oz = oz0 + offz
            dx = llx + st_s * hx + st_t * vx - ox
            dy = lly + st_s * hy + st_t * vy - oy
            dz = llz + st_s * hz + st_t * vz - oz
            return ox, oy, oz, dx, dy, dz

        # --- PATH REGENERATION -------------------------------------------
        # One while_loop serves every (sample, bounce, pixel slot) of the
        # tile: when a lane's path terminates (sky / absorb / RR kill /
        # depth exhausted) its contribution is folded into its pixel's
        # accumulator and the lane immediately starts its NEXT sample in
        # place — and when its samples run out, its next PIXEL. The GLSL
        # kernel gets this for free from SIMT occupancy; for the TPU's
        # fixed (r_sub, LANES) vector shape it is the difference between
        # paying for max-depth-of-1024-lanes per sample and paying
        # E[depth] — measured live-lane fraction on the cover scene is
        # 100/85/37/20/11% at bounces 0-4, so the non-regenerating
        # spp-loop wasted 3-5x. Per-lane sample/bounce/slot counters are
        # carried as f32 (exact for the magnitudes involved; Mosaic
        # while-carries of int vectors are the pitfall this sidesteps).
        # RNG draw counters per (pixel, sample, bounce) are unchanged, so
        # output is BITWISE identical to the pre-regeneration kernel.
        #
        # Per-slot accumulators live in the OUTPUT block (masked fma per
        # iteration), not in carries: channel 3k+c is slot k's linear
        # color sum, 3K+k its per-lane path cost, 4K the tile's segment
        # count — and the carry count DROPS vs. the register-accumulator
        # form.
        out_ref[0] = jnp.zeros(
            (nacc * k_slots + 1, r_sub, LANES), jnp.float32
        )
        s_f0 = zero
        px0, py0, pix0, in0 = pixel_state(zero)
        ox, oy, oz, dx, dy, dz = gen_ray(s_f0, px0, py0, pix0)

        def live_cond(state):
            alive = state[12]
            return jnp.max(alive) > 0.0

        has_self = (not cluster) and g_full < s_pad
        FILLQ = jnp.float32(3e38)

        def body(state):
            (ox, oy, oz, dx, dy, dz, cr, cg, cb,
             s_f, i_f, k_f, alive, segs, *pp) = state
            if cluster:
                # per-bounce cluster-walk state: best hit so far (q-space
                # + winner slot id) and the visited cursor — the
                # (entry q, cluster idx) of the last visited cluster,
                # which with the lexicographic (q, idx) visit order fully
                # encodes the visited SET (no per-cluster mask carry).
                # cluster_packed_key carries the cursor as ONE packed
                # f32 (floored entry bits | idx) instead of two arrays.
                if opts.cluster_packed_key:
                    bq, bs, kl = pp
                else:
                    bq, bs, ql, il = pp
            if has_self:
                # the sphere this lane's origin sits on (last bounce's
                # winner): exact far-root SELF-test below restores the
                # one legitimate far-root case the near-only scan drops —
                # a path re-entering the sphere it just hit (glass-free
                # scenes still do this through f32 hit-point roundoff:
                # measured ±4e-4 penetration on a radius-30 sphere)
                (p_cx, p_cy, p_cz, p_ir, p_k1, p_mt,
                 p_ar, p_ag, p_ab, p_fz, p_rf) = pp
            _, _, pix, _ = pixel_state(k_f)
            ctr0 = (
                (sample_offset + s_f.astype(jnp.int32)) * draws_per_sample
            )
            ctr = ctr0 + 4 + i_f.astype(jnp.int32) * draws_per_bounce

            if not cluster:
                # cluster mode counts a segment when its bounce COMPLETES
                # (one iteration = one cluster step, not one bounce)
                segs = segs + jnp.sum(alive)
            # one-hot over the lane's current pixel slot: routes this
            # iteration's cost tick and any path contribution to that
            # pixel's accumulator channels
            if k_slots == 1:
                ohk = [one]
            else:
                ohk = [
                    (k_f == jnp.float32(k)).astype(jnp.float32)
                    for k in range(k_slots)
                ]
            for k in range(k_slots):
                # per-lane path cost: the profile that drives pixel sorting
                out_ref[0, 3 * k_slots + k] = (
                    out_ref[0, 3 * k_slots + k] + alive * ohk[k]
                )
            alive_b = alive > 0.0

            # --- closest-hit scan (shader.frag:145-196), vectorized ---
            # Spheres live on SUBLANES, rays on LANES: each row of 128
            # rays is tested against all S_pad spheres as one (S_pad,128)
            # vector computation, and the closest hit is a sublane-axis
            # min-reduction. No scalar loops — full VPU width always.
            #
            # Equivalence to the sequential shrinking-t_max scan: a
            # sphere whose near root exceeds the eventual minimum loses
            # the min anyway, and the near→far fallback only depends on
            # t_min; so min-over-candidates == the sequential result
            # (ties: lowest index wins here, last-tested wins in the
            # reference — indistinguishable in practice).
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            o_dot_d = _dot3(ox, oy, oz, dx, dy, dz)
            o_dot_o = _dot3(ox, oy, oz, ox, oy, oz)

            # scan in q = t·|d|² space: a > 0 is constant per ray, so
            # argmin over q equals argmin over t and the two per-sphere
            # divisions (root·inv_a) collapse into one per-row multiply
            min_t_a = MIN_T * a
            if cluster:
                # --- GATHERED CLUSTER SCAN (TraceOptions.cluster_scan) ---
                # One iteration of the per-lane cluster walk. Fresh lanes
                # (bounce just started: visited cursor at -inf) first
                # exact-test the GLOBAL spheres (full near->far fallback;
                # globals are the containable ground/big spheres), seeding
                # the running best. Every lane then bound-tests all K_pad
                # clusters, extracts its cpi nearest not-yet-visited
                # entries in lexicographic (entry q, cluster idx) order,
                # and exact-tests their members fetched by PER-LANE
                # lane-axis dynamic gather (Mosaic lowers same-shape
                # take_along_axis to tpu.dynamic_gather, jax >= 0.9.0).
                # Member/global arithmetic mirrors the flat scan op order
                # bitwise, so q values are identical and images match the
                # flat kernel except on exact q ties (visit order here vs
                # lowest slot index there). Full near->far fallback =
                # tracer.hit_world semantics: self-reentry resolves
                # naturally (the origin sits inside the last-hit sphere's
                # bound, so its cluster is visited first) - no self-test.
                fresh = (
                    kl if opts.cluster_packed_key else ql
                ) < jnp.float32(-1e38)
                g_best = jnp.full((r_sub, LANES), FILLQ)
                g_slot = zero
                for g0 in range(n_global_total):
                    # pad iterations re-test global 0: the strict < on
                    # the running min never re-updates, so they are
                    # pure measured cost (cluster_pad_global)
                    g = min(g0, n_global - 1)
                    gcx = uni_ref[_UNI_GLOBALS + 4 * g]
                    gcy = uni_ref[_UNI_GLOBALS + 4 * g + 1]
                    gcz = uni_ref[_UNI_GLOBALS + 4 * g + 2]
                    gk1 = uni_ref[_UNI_GLOBALS + 4 * g + 3]
                    cdd = gcx * dx + gcy * dy + gcz * dz
                    cdo = gcx * ox + gcy * oy + gcz * oz
                    nbg = cdd - o_dot_d
                    ccg = o_dot_o - 2.0 * cdo + gk1
                    dsg = nbg * nbg - a * ccg
                    sqg = jnp.where(
                        dsg >= 0.0, jnp.sqrt(jnp.abs(dsg)),
                        jnp.float32(-3e38),
                    )
                    qng = nbg - sqg
                    qg = jnp.where(qng >= min_t_a, qng, nbg + sqg)
                    qg = jnp.where(qg >= min_t_a, qg, FILLQ)
                    upd = qg < g_best
                    g_best = jnp.where(upd, qg, g_best)
                    g_slot = jnp.where(upd, jnp.float32(g), g_slot)
                bq = jnp.where(fresh, g_best, bq)
                bs = jnp.where(fresh, g_slot, bs)

                # broad phase: cluster bounds on SUBLANES per ray row
                # (the flat scan's layout), conservative entry in q-space
                box_bounds = opts.cluster_bounds == "box"
                if box_bounds:
                    # member-AABB slab test (TraceOptions.cluster_bounds
                    # ='box'): the cover's small spheres form a thin slab
                    # over the ground, so the AABB is far tighter than
                    # the bounding sphere for near-horizontal rays —
                    # measured ~2.4x fewer tested clusters/segment
                    # (scripts/measure_cluster_hits.py). Same cost class
                    # (~27 vs ~24 ops/bound-row). Direction reciprocals
                    # are eps-clamped so no product can reach f32 inf
                    # (|coord| <= ~1e3, eps 1e-12 -> q <= ~1e17; padding
                    # boxes at lo = hi = 1e9 land beyond the 1e20
                    # candidate cutoff below instead of overflowing).
                    b_lox = bnd_ref[:, 0:1]
                    b_loy = bnd_ref[:, 1:2]
                    b_loz = bnd_ref[:, 2:3]
                    b_hix = bnd_ref[:, 3:4]
                    b_hiy = bnd_ref[:, 4:5]
                    b_hiz = bnd_ref[:, 5:6]
                    beps = jnp.float32(1e-12)
                    inv_dx = 1.0 / jnp.where(
                        dx >= 0.0, jnp.maximum(dx, beps),
                        jnp.minimum(dx, -beps),
                    )
                    inv_dy = 1.0 / jnp.where(
                        dy >= 0.0, jnp.maximum(dy, beps),
                        jnp.minimum(dy, -beps),
                    )
                    inv_dz = 1.0 / jnp.where(
                        dz >= 0.0, jnp.maximum(dz, beps),
                        jnp.minimum(dz, -beps),
                    )
                else:
                    b_cx = bnd_ref[:, 0:1]
                    b_cy = bnd_ref[:, 1:2]
                    b_cz = bnd_ref[:, 2:3]
                    b_k1 = bnd_ref[:, 3:4]
                # i32 iota + convert (the kernel's established pattern —
                # a direct f32 iota is an untested Mosaic lowering)
                idx_iota_i = jax.lax.broadcasted_iota(
                    jnp.int32, (k_pad_c, LANES), 0
                )
                idx_iota = idx_iota_i.astype(jnp.float32)
                cpi = opts.cluster_cpi
                packed = opts.cluster_packed_key
                fused = opts.cluster_fused_done
                # fused done (TraceOptions.cluster_fused_done): extract
                # ONE selection beyond the cpi visits — after this
                # iteration's visits and cursor advance, the nearest
                # unvisited entry is exactly selection cpi (the chain IS
                # the sorted unvisited order), so the bounce can complete
                # in the visiting iteration instead of paying a full
                # extra iteration to rediscover it next trip.
                n_sel = cpi + 1 if fused else cpi
                sel_q = [[] for _ in range(n_sel)]
                sel_i = [[] for _ in range(n_sel)]
                sel_k = [[] for _ in range(n_sel)]
                done_rows = []
                for row in range(r_sub):
                    dxr = dx[row : row + 1]
                    dyr = dy[row : row + 1]
                    dzr = dz[row : row + 1]
                    oxr = ox[row : row + 1]
                    oyr = oy[row : row + 1]
                    ozr = oz[row : row + 1]
                    a_r = a[row : row + 1]
                    odd_r = o_dot_d[row : row + 1]
                    ooo_r = o_dot_o[row : row + 1]
                    min_q = min_t_a[row : row + 1]
                    if box_bounds:
                        # slab test in t, compared in q-space (q = a·t,
                        # the scan's comparison space). Origin inside
                        # the box clips to min_q — visited before
                        # everything (self-reentry resolves first, like
                        # the sphere bound). Entries past 1e20 (padding
                        # boxes, eps-clamped parallel axes) demote to
                        # FILLQ = not a candidate: real geometry sits
                        # at q <= a·MAX_T ~ 1e7.
                        ivx = inv_dx[row : row + 1]
                        ivy = inv_dy[row : row + 1]
                        ivz = inv_dz[row : row + 1]
                        t1 = (b_lox - oxr) * ivx
                        t2 = (b_hix - oxr) * ivx
                        tn = jnp.minimum(t1, t2)
                        tf = jnp.maximum(t1, t2)
                        t1 = (b_loy - oyr) * ivy
                        t2 = (b_hiy - oyr) * ivy
                        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                        t1 = (b_loz - ozr) * ivz
                        t2 = (b_hiz - ozr) * ivz
                        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                        qn_q = jnp.maximum(tn * a_r, min_q)
                        hitb = (
                            (tf >= tn) & (tf * a_r >= min_q)
                            & (qn_q < jnp.float32(1e20))
                        )
                        qe = jnp.where(hitb, qn_q, FILLQ)
                    else:
                        cdd = b_cx * dxr + b_cy * dyr + b_cz * dzr
                        cdo = b_cx * oxr + b_cy * oyr + b_cz * ozr
                        nbb = cdd - odd_r
                        ccb = ooo_r - 2.0 * cdo + b_k1
                        dsb = nbb * nbb - a_r * ccb
                        sqb = jnp.where(
                            dsb >= 0.0, jnp.sqrt(jnp.abs(dsb)),
                            jnp.float32(-3e38),
                        )
                        # entry = max(q_near, min_q) when the bound is
                        # hit at all (q_far >= min_q; disc < 0 poisons
                        # q_far to -3e38 < min_q), else FILLQ. Origin
                        # inside the bound clips to min_q - visited
                        # before everything.
                        qe = jnp.where(
                            nbb + sqb >= min_q,
                            jnp.maximum(nbb - sqb, min_q),
                            FILLQ,
                        )
                    if packed:
                        # pack (entry q, cluster idx) into ONE sortable
                        # f32 key: clear the entry's 7 low mantissa bits
                        # (FLOOR — conservative: entries only move
                        # earlier, so no cluster is ever skipped before
                        # the bounce completes) and OR the index in.
                        # Positive-f32 bit patterns are monotone in the
                        # value, so one vector compare implements the
                        # lexicographic cursor and one min-reduce
                        # extracts value AND argmin together.
                        qb = jax.lax.bitcast_convert_type(qe, jnp.int32)
                        keyf = jax.lax.bitcast_convert_type(
                            jax.lax.bitwise_or(
                                jax.lax.bitwise_and(qb, jnp.int32(~127)),
                                idx_iota_i,
                            ),
                            jnp.float32,
                        )
                        klr = kl[row : row + 1]
                        for j in range(n_sel):
                            unv = keyf > klr
                            cand = jnp.where(unv, keyf, jnp.float32(jnp.inf))
                            m = jnp.min(cand, axis=0, keepdims=True)
                            sel_k[j].append(m)
                            klr = m
                        continue
                    qlr = ql[row : row + 1]
                    ilr = il[row : row + 1]
                    for j in range(n_sel):
                        unv = (qe > qlr) | (
                            (qe == qlr) & (idx_iota > ilr)
                        )
                        cand = jnp.where(unv, qe, FILLQ)
                        m = jnp.min(cand, axis=0, keepdims=True)
                        isel = jnp.min(
                            jnp.where(
                                cand == m, idx_iota, jnp.float32(LANES)
                            ),
                            axis=0, keepdims=True,
                        )
                        sel_q[j].append(m)
                        sel_i[j].append(isel)
                        qlr, ilr = m, isel
                    # bounce DONE when the nearest unvisited entry cannot
                    # beat the running best (>=: an equal entry can only
                    # tie, and ties keep the earlier winner)
                    done_rows.append(
                        (sel_q[0][row] >= bq[row : row + 1])
                        .astype(jnp.float32)
                    )
                if packed:
                    # unpack at full (r_sub, LANES) shape (per-row bit
                    # ops on (1,128) reduce outputs are the known Mosaic
                    # sublane-broadcast trap; (8,128) int ops are proven
                    # by the winner-bank gather below). done when the
                    # floored nearest entry can't beat the best — floor
                    # can only DELAY completion by a harmless extra
                    # visit — or when the selection is a FILL/padding
                    # key (>= FILLQ's floored pattern; covers the
                    # bq == FILLQ miss case the floor would starve).
                    keys0 = jnp.concatenate(sel_k[0], axis=0)
                    k0i = jax.lax.bitcast_convert_type(keys0, jnp.int32)
                    q0 = jax.lax.bitcast_convert_type(
                        jax.lax.bitwise_and(k0i, jnp.int32(~127)),
                        jnp.float32,
                    )
                    fill_floor = jnp.float32(
                        np.int32(
                            np.float32(3e38).view(np.int32) & ~np.int32(127)
                        ).view(np.float32)
                    )
                    imm_done = (q0 >= bq) | (keys0 >= fill_floor)
                else:
                    imm_done = jnp.concatenate(done_rows, axis=0) > 0.5
                # imm_done: the pre-visit test (nearest unvisited entry
                # cannot beat the best carried in from the PREVIOUS
                # visit) — the unfused walk's only done test, kept in
                # fused mode for lanes with nothing worth visiting at
                # all this iteration (fresh lanes beaten by the globals
                # seed, exhausted lists).
                u_live = alive_b & jnp.logical_not(imm_done)

                # exact-test the selected clusters' members (gathered by
                # per-lane cluster id; one (8,128) gather per member
                # param). A FILL selection (list exhausted) resolves to
                # the lowest all-FILL bound slot, whose members are
                # encoded unhittable - a harmless no-op; clamp is gather
                # range safety only.
                for j in range(cpi):
                    if packed:
                        # low 7 key bits ARE the cluster index (an inf
                        # FILL selection unpacks to 0 — harmless: its
                        # lane is bounce-done, every update is masked)
                        cidx = jax.lax.bitwise_and(
                            jax.lax.bitcast_convert_type(
                                jnp.concatenate(sel_k[j], axis=0),
                                jnp.int32,
                            ),
                            jnp.int32(127),
                        )
                        cidx_f = cidx.astype(jnp.float32)
                    else:
                        cidx_f = jnp.concatenate(sel_i[j], axis=0)
                        cidx_f = jnp.minimum(
                            cidx_f, jnp.float32(LANES - 1)
                        )
                        cidx = cidx_f.astype(jnp.int32)
                    for mm in range(group_total):
                        mcx = jnp.take_along_axis(
                            mem_ref[4 * mm], cidx, axis=1
                        )
                        mcy = jnp.take_along_axis(
                            mem_ref[4 * mm + 1], cidx, axis=1
                        )
                        mcz = jnp.take_along_axis(
                            mem_ref[4 * mm + 2], cidx, axis=1
                        )
                        mk1 = jnp.take_along_axis(
                            mem_ref[4 * mm + 3], cidx, axis=1
                        )
                        cdd = mcx * dx + mcy * dy + mcz * dz
                        cdo = mcx * ox + mcy * oy + mcz * oz
                        nbm = cdd - o_dot_d
                        ccm = o_dot_o - 2.0 * cdo + mk1
                        dsm = nbm * nbm - a * ccm
                        sqm = jnp.where(
                            dsm >= 0.0, jnp.sqrt(jnp.abs(dsm)),
                            jnp.float32(-3e38),
                        )
                        qnm = nbm - sqm
                        qm = jnp.where(qnm >= min_t_a, qnm, nbm + sqm)
                        qm = jnp.where(qm >= min_t_a, qm, FILLQ)
                        upd = u_live & (qm < bq)
                        bq = jnp.where(upd, qm, bq)
                        bs = jnp.where(
                            upd,
                            jnp.float32(n_global)
                            + cidx_f * jnp.float32(group)
                            + jnp.float32(mm),
                            bs,
                        )
                # advance the visited cursor past this iteration's last
                # selection (a FILL cursor = list exhausted: the next
                # iteration extracts FILL and the lane completes)
                if packed:
                    kl = jnp.where(
                        u_live, jnp.concatenate(sel_k[cpi - 1], axis=0),
                        kl,
                    )
                else:
                    ql = jnp.where(
                        u_live, jnp.concatenate(sel_q[cpi - 1], axis=0),
                        ql,
                    )
                    il = jnp.where(
                        u_live, jnp.concatenate(sel_i[cpi - 1], axis=0),
                        il,
                    )

                if fused:
                    # post-visit done: selection cpi is the nearest entry
                    # still unvisited after this iteration's visits; the
                    # bounce completes NOW when it cannot beat the just-
                    # updated best (>=: an equal entry can only tie, and
                    # ties keep the earlier winner). Same stop rule as
                    # the unfused walk — it compares the same entry
                    # against the same post-visit best, one iteration
                    # later — so the visited set/order, images, and
                    # exact segment totals are unchanged.
                    if packed:
                        keysN = jnp.concatenate(sel_k[cpi], axis=0)
                        kNi = jax.lax.bitcast_convert_type(
                            keysN, jnp.int32
                        )
                        qN = jax.lax.bitcast_convert_type(
                            jax.lax.bitwise_and(kNi, jnp.int32(~127)),
                            jnp.float32,
                        )
                        new_done = u_live & (
                            (qN >= bq) | (keysN >= fill_floor)
                        )
                    else:
                        # raw FILLQ selections satisfy qN >= bq directly
                        qN = jnp.concatenate(sel_q[cpi], axis=0)
                        new_done = u_live & (qN >= bq)
                    bdone = imm_done | new_done
                else:
                    bdone = imm_done
                ab = alive_b & bdone
                segs = segs + jnp.sum(jnp.where(ab, one, zero))

                # winner params by BANKED per-lane gather on the slot id
                # (consumed only by bounce-done lanes; non-done lanes
                # gather garbage that every consumer masks away)
                isl = bs.astype(jnp.int32)
                bank = jax.lax.shift_right_logical(isl, 7)
                woff = jax.lax.bitwise_and(isl, jnp.int32(LANES - 1))
                nw = 11 if opts.enable_debug else 10
                wv = []
                for p in range(nw):
                    v = zero
                    # pad banks (cluster_pad_banks) hold zeros no slot
                    # id can select — pure measured gather+select cost
                    for b in range(n_banks_total):
                        gv = jnp.take_along_axis(
                            win_ref[p * n_banks_total + b], woff, axis=1
                        )
                        v = jnp.where(bank == jnp.int32(b), gv, v)
                    wv.append(v)
                (scx, scy, scz, inv_r, mat,
                 al_r, al_g, al_b, fuzz, refr) = wv[:10]
                if opts.enable_debug:
                    uuid_w = wv[10]
                best_q = bq
            else:
                bq_rows = []
                for row in range(r_sub):
                    dxr = dx[row : row + 1]
                    dyr = dy[row : row + 1]
                    dzr = dz[row : row + 1]
                    oxr = ox[row : row + 1]
                    oyr = oy[row : row + 1]
                    ozr = oz[row : row + 1]
                    a_r = a[row : row + 1]
                    inv_a_r = inv_a[row : row + 1]
                    odd_r = o_dot_d[row : row + 1]
                    ooo_r = o_dot_o[row : row + 1]
                    min_q = min_t_a[row : row + 1]

                    if opts.scan_mxu:
                        # MXU offload: nb and the k1-folded c·o for ALL
                        # spheres are two (S_pad,4)@(4,128) DEFAULT matmuls
                        # (operands round to bf16; the winner's quadratic is
                        # re-evaluated in exact f32 after the gather, so only
                        # candidate ORDERING near ties is fuzzed). The MXU
                        # runs concurrently with the VPU, so these ride free
                        # under the scan's remaining elementwise work.
                        b1 = jnp.concatenate(
                            [dxr, dyr, dzr, -odd_r], axis=0
                        )
                        b2 = jnp.concatenate(
                            [oxr, oyr, ozr, jnp.ones_like(oxr)], axis=0
                        )
                        nb = jax.lax.dot_general(
                            mxt_ref[0], b1, dn,
                            preferred_element_type=jnp.float32,
                        )
                        cok = jax.lax.dot_general(
                            mxt_ref[1], b2, dn,
                            preferred_element_type=jnp.float32,
                        )
                        c_coef = ooo_r - 2.0 * cok
                    else:
                        c_dot_d = s_cx * dxr + s_cy * dyr + s_cz * dzr
                        c_dot_o = s_cx * oxr + s_cy * oyr + s_cz * ozr
                        # nb = -half_b (shader.frag:152): building the negated
                        # form directly saves the negation in both root
                        # computations (bitwise-safe: rn(b-a) == -rn(a-b) for
                        # finite f32)
                        nb = c_dot_d - odd_r
                        c_coef = ooo_r - 2.0 * c_dot_o + s_k1
                    disc = nb * nb - a_r * c_coef
                    # disc < 0 ⇒ poison sq to -3e38: q_near = -half_b + 3e38
                    # absorbs to EXACTLY 3e38 (|half_b| ≪ ulp(3e38)), i.e. the
                    # fill value itself, so no upper-bound test is needed (no
                    # real geometry sits beyond MAX_T; no-hit is detected from
                    # the fill). NOT sqrt-of-negative→NaN: Mosaic's sqrt is not
                    # IEEE there (measured wrong images on device). Inactive
                    # slots are encoded unhittable in the table (center=0,
                    # k1=+1 ⇒ disc < 0 by Cauchy-Schwarz): no active test.
                    sq = jnp.where(
                        disc >= 0.0, jnp.sqrt(jnp.abs(disc)), jnp.float32(-3e38)
                    )
                    q_near = nb - sq
                    if g_full >= s_pad:
                        q_far = nb + sq
                        q = jnp.where(q_near >= min_q, q_near, q_far)
                        cand = jnp.where(q >= min_q, q, jnp.float32(3e38))
                    elif g_full == 0:
                        cand = jnp.where(
                            q_near >= min_q, q_near, jnp.float32(3e38)
                        )
                    else:
                        # split scan: full fallback for the containable
                        # prefix, near-only for the rest (g_full is sublane-
                        # aligned, so both halves are canonically tiled)
                        qn_g = q_near[:g_full]
                        qf_g = nb[:g_full] + sq[:g_full]
                        qg = jnp.where(qn_g >= min_q, qn_g, qf_g)
                        cand_g = jnp.where(qg >= min_q, qg, jnp.float32(3e38))
                        qn_r = q_near[g_full:]
                        cand_r = jnp.where(
                            qn_r >= min_q, qn_r, jnp.float32(3e38)
                        )
                        cand = jnp.concatenate([cand_g, cand_r], axis=0)
                    bq = jnp.min(cand, axis=0, keepdims=True)  # (1, LANES)
                    bq_rows.append(bq)
                    # one-hot winner mask (ties: both fire — only on exactly
                    # coincident surfaces). All-fill (no-hit) columns gather
                    # the sum of every slot's params — finite garbage that is
                    # provably unused: every consumer is masked by ``hit``.
                    # The gather is EXACT f32 via a 3-term bf16 split of the
                    # param table (hi/mid/lo each bf16-representable, one-hot
                    # exact in bf16, f32 accumulation) — 3 single-pass DEFAULT
                    # matmuls instead of one 6-pass HIGHEST.
                    oh = (cand == bq).astype(jnp.float32)
                    gat_ref[:, row, :] = (
                        jax.lax.dot_general(
                            prm_ref[0], oh, dn,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            prm_ref[1], oh, dn,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            prm_ref[2], oh, dn,
                            preferred_element_type=jnp.float32,
                        )
                    )

                best_q = jnp.concatenate(bq_rows, axis=0)
                scx = gat_ref[0]
                scy = gat_ref[1]
                scz = gat_ref[2]
                inv_r = gat_ref[3]
                mat = gat_ref[4]
                al_r = gat_ref[5]
                al_g = gat_ref[6]
                al_b = gat_ref[7]
                fuzz = gat_ref[8]
                refr = gat_ref[9]
                if opts.scan_mxu:
                    # EXACT f32 re-evaluation of the winner's quadratic from
                    # the (exact, bf16-split-gathered) winner params: the
                    # DEFAULT-precision scan matmuls fuzz candidate q values
                    # ~2^-8 relative, which may reorder near-coincident
                    # candidates but must NOT move the chosen winner's hit
                    # geometry. Op order mirrors the self-test below exactly,
                    # so a duplicate candidate (winner == last-hit sphere)
                    # ties bitwise and the self-test's strict < still keeps
                    # the scan's winner.
                    w_k1 = gat_ref[10]
                    scan_hit = best_q * inv_a < jnp.float32(1e20)
                    w_cdd = _dot3(scx, scy, scz, dx, dy, dz)
                    w_cdo = _dot3(scx, scy, scz, ox, oy, oz)
                    w_nb = w_cdd - o_dot_d
                    w_cc = o_dot_o - 2.0 * w_cdo + w_k1
                    w_disc = w_nb * w_nb - a * w_cc
                    w_sq = jnp.where(
                        w_disc >= 0.0, jnp.sqrt(jnp.abs(w_disc)),
                        jnp.float32(-3e38),
                    )
                    w_qn = w_nb - w_sq
                    w_q = jnp.where(w_qn >= min_t_a, w_qn, w_nb + w_sq)
                    # fuzz-admitted ghosts (exact roots behind MIN_T, or
                    # exact disc < 0 → w_q absorbs to 3e38) demote to miss;
                    # no-hit lanes keep the scan's fill untouched (their
                    # gathered params are the documented all-slot garbage)
                    w_q = jnp.where(w_q >= min_t_a, w_q, jnp.float32(3e38))
                    best_q = jnp.where(scan_hit, w_q, best_q)
                if has_self:
                    # exact per-lane far-root test of the LAST-HIT sphere —
                    # arithmetic mirrors the scan exactly (same op order, k1
                    # gathered from the table), so when that sphere is in the
                    # containable prefix the duplicate candidate ties bitwise
                    # and the strict < keeps the scan's winner
                    s_cdd = _dot3(p_cx, p_cy, p_cz, dx, dy, dz)
                    s_cdo = _dot3(p_cx, p_cy, p_cz, ox, oy, oz)
                    s_nb = s_cdd - o_dot_d
                    s_cc = o_dot_o - 2.0 * s_cdo + p_k1
                    s_disc = s_nb * s_nb - a * s_cc
                    s_sq = jnp.where(
                        s_disc >= 0.0, jnp.sqrt(jnp.abs(s_disc)),
                        jnp.float32(-3e38),
                    )
                    s_qf = s_nb + s_sq
                    # valid only mid-path (i_f >= 1: origin is a hit point)
                    self_ok = (
                        (i_f >= 1.0) & (s_qf >= min_t_a) & (s_qf < best_q)
                    )
                    best_q = jnp.where(self_ok, s_qf, best_q)
                    k1_w = jnp.where(self_ok, p_k1, gat_ref[10])
                    scx = jnp.where(self_ok, p_cx, scx)
                    scy = jnp.where(self_ok, p_cy, scy)
                    scz = jnp.where(self_ok, p_cz, scz)
                    inv_r = jnp.where(self_ok, p_ir, inv_r)
                    mat = jnp.where(self_ok, p_mt, mat)
                    al_r = jnp.where(self_ok, p_ar, al_r)
                    al_g = jnp.where(self_ok, p_ag, al_g)
                    al_b = jnp.where(self_ok, p_ab, al_b)
                    fuzz = jnp.where(self_ok, p_fz, fuzz)
                    refr = jnp.where(self_ok, p_rf, refr)
            best_t = best_q * inv_a
            # no-hit lanes keep the 3e38·inv_a fill — with |d| bounded by
            # the viewport basis, fill/|d|² stays astronomically above
            # MAX_T; detect via t, NOT via the one-hot (an all-fill
            # column ties at the fill value)
            hit = best_t < jnp.float32(1e20)
            best_t = jnp.where(hit, best_t, MAX_T)
            if not cluster:
                # ab gates the scatter/terminate/regenerate tail: every
                # live lane in flat mode (one iteration = one bounce);
                # only bounce-DONE lanes in cluster mode (mid-walk lanes
                # keep their ray/path state untouched this iteration)
                ab = alive_b

            # hit point + front-face-corrected normal (shader.frag:166-171)
            hpx = ox + best_t * dx
            hpy = oy + best_t * dy
            hpz = oz + best_t * dz
            nx = (hpx - scx) * inv_r
            ny = (hpy - scy) * inv_r
            nz = (hpz - scz) * inv_r
            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

            if opts.enable_debug:
                # in-kernel debug overlay (shader.frag:306-318, uniforms
                # src/webgl.rs:579-590): cursor-proximity marker (solid
                # blue within 0.1 of u_cursor_point) and selection
                # outline (solid red on the selected sphere at grazing
                # incidence) terminate the sample with a FIXED color
                # before scatter — identical to the jnp tracer's branch.
                cur_x, cur_y, cur_z = uni_ref[19], uni_ref[20], uni_ref[21]
                sel = uni_ref[22]
                dcx = hpx - cur_x
                dcy = hpy - cur_y
                dcz = hpz - cur_z
                cursor_hit = (
                    ab & hit
                    & (dcx * dcx + dcy * dcy + dcz * dcz
                       < jnp.float32(0.01))
                )
                if not cluster:
                    # row 11 of the gather table: winner's uuid (slot
                    # index; the debug path disables the containable
                    # permutation so it matches picking's sphere id).
                    # Cluster mode gathered the ORIGINAL index from the
                    # winner banks above (the partition reorders slots).
                    uuid_w = gat_ref[11]
                outline = (
                    ab & hit & jnp.logical_not(cursor_hit)
                    & (uuid_w == sel)
                    & (_dot3(dx, dy, dz, nx, ny, nz)
                       > jnp.float32(-0.05))
                )

            # --- scatter (shader.frag:210-286), branch-free ---
            uvx, uvy, uvz = _unit_vec(pix, ctr, 0)
            usx, usy, usz = _unit_sphere(pix, ctr, 3)
            glass_u = _u01(pix, ctr, 6)
            if stratified:
                # FIRST-bounce stratified draws (core/sampling.py
                # R2_ALPHAS_B0): the s_abs-th Kronecker point under
                # per-pixel rotations at counters -8..-6 (disjoint from
                # the camera rotations -4..-1 and every per-sample block
                # >= 0) — diffuse unit vector via the Archimedes (hx,
                # phi) map (radius cancels, same distribution as
                # _unit_vec) + the glass Schlick roll. Deeper bounces
                # keep the counter-hashed draws. Measured 1.6-1.8x MSE
                # cut on diffuse scenes (PERF.md).
                rot_b = jnp.uint32(0xFFFFFFF8)
                s_u = (
                    (sample_offset + s_f.astype(jnp.int32))
                    .astype(jnp.uint32)
                )

                def r2b(d):
                    return _r2_fixed(pix, rot_b, d, s_u, _AB0_FIX[d])

                b_hx = r2b(0) * 2.0 - 1.0
                b_phi = r2b(1) * TWO_PI
                b_s = jnp.sqrt(jnp.maximum(0.0, 1.0 - b_hx * b_hx))
                first = i_f < 0.5
                uvx = jnp.where(first, b_s * jnp.sin(b_phi), uvx)
                uvy = jnp.where(first, b_s * jnp.cos(b_phi), uvy)
                uvz = jnp.where(first, b_hx, uvz)
                glass_u = jnp.where(first, r2b(2), glass_u)

            # DIFFUSE
            ddx = nx + uvx
            ddy = ny + uvy
            ddz = nz + uvz
            if opts.near_zero_guard:
                nz_mask = (
                    (jnp.abs(ddx) < 1e-8)
                    & (jnp.abs(ddy) < 1e-8)
                    & (jnp.abs(ddz) < 1e-8)
                )
                ddx = jnp.where(nz_mask, nx, ddx)
                ddy = jnp.where(nz_mask, ny, ddy)
                ddz = jnp.where(nz_mask, nz, ddz)

            # METAL: reflect + fuzz
            d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
            mdx = dx - 2.0 * d_dot_n * nx + fuzz * usx
            mdy = dy - 2.0 * d_dot_n * ny + fuzz * usy
            mdz = dz - 2.0 * d_dot_n * nz + fuzz * usz
            metal_ok = _dot3(nx, ny, nz, mdx, mdy, mdz) > 0.0

            # GLASS: Snell + TIR + Schlick roulette
            ratio = jnp.where(front, 1.0 / refr, refr)
            udx, udy, udz = _normalize3(dx, dy, dz)
            cos_t = jnp.minimum(-_dot3(udx, udy, udz, nx, ny, nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            one_m = 1.0 - cos_t
            one_m2 = one_m * one_m
            schlick = r0 + (1.0 - r0) * one_m2 * one_m2 * one_m
            reflects = jnp.logical_or(cannot, schlick > glass_u)
            # refract (unit dir): perp = ratio*(ud + cos*n); par = -sqrt(k)*n
            rpx = ratio * (udx + cos_t * nx)
            rpy = ratio * (udy + cos_t * ny)
            rpz = ratio * (udz + cos_t * nz)
            k = jnp.maximum(0.0, 1.0 - (rpx * rpx + rpy * rpy + rpz * rpz))
            sk = jnp.sqrt(k)
            refx = rpx - sk * nx
            refy = rpy - sk * ny
            refz = rpz - sk * nz
            # reflect of unit dir
            ud_dot_n = _dot3(udx, udy, udz, nx, ny, nz)
            grx = udx - 2.0 * ud_dot_n * nx
            gry = udy - 2.0 * ud_dot_n * ny
            grz = udz - 2.0 * ud_dot_n * nz
            gdx = jnp.where(reflects, grx, refx)
            gdy = jnp.where(reflects, gry, refy)
            gdz = jnp.where(reflects, grz, refz)

            is_diffuse = mat < 0.5
            is_metal = jnp.logical_and(mat >= 0.5, mat < 1.5)
            is_glass = jnp.logical_and(mat >= 1.5, mat < 2.5)
            ndx = jnp.where(is_diffuse, ddx, jnp.where(is_metal, mdx, gdx))
            ndy = jnp.where(is_diffuse, ddy, jnp.where(is_metal, mdy, gdy))
            ndz = jnp.where(is_diffuse, ddz, jnp.where(is_metal, mdz, gdz))
            # pure boolean algebra — select_n over i1 vectors doesn't
            # lower in Mosaic (i8->i1 trunci)
            did_scatter = is_diffuse | (is_metal & metal_ok) | is_glass

            # --- terminations and continuations -------------------------
            miss = jnp.logical_and(ab, jnp.logical_not(hit))
            scat = ab & hit & did_scatter
            if opts.enable_debug:
                # debug-marked lanes end their sample here (the GLSL
                # kernel's early returns, shader.frag:310/314)
                scat = (
                    scat & jnp.logical_not(cursor_hit)
                    & jnp.logical_not(outline)
                )

            # sky on miss (shader.frag:289-294, 331-335) — throughput
            # BEFORE this bounce's albedo, as in the bounce-loop original
            udy_sky = udy
            sky_t = 0.5 * (udy_sky + 1.0)
            sky_r = 1.0 - 0.5 * sky_t
            sky_g = 1.0 - 0.3 * sky_t
            sky_b = jnp.ones_like(sky_t)
            con_r = jnp.where(miss, cr * sky_r, zero)
            con_g = jnp.where(miss, cg * sky_g, zero)
            con_b = jnp.where(miss, cb * sky_b, zero)
            if opts.enable_debug:
                # fixed overlay colors, NOT throughput-scaled (the
                # reference writes them straight to the fragment):
                # cursor marker blue (0,0,1), outline red (1,0,0).
                # Disjoint from miss (both require a hit).
                con_r = jnp.where(cursor_hit, zero, con_r)
                con_r = jnp.where(outline, one, con_r)
                con_g = jnp.where(cursor_hit | outline, zero, con_g)
                con_b = jnp.where(cursor_hit, one, con_b)
                con_b = jnp.where(outline, zero, con_b)

            cr = jnp.where(scat, cr * al_r, cr)
            cg = jnp.where(scat, cg * al_g, cg)
            cb = jnp.where(scat, cb * al_b, cb)
            if opts.russian_roulette_depth > 0:
                # unbiased termination: survive with p = max(throughput)
                p_surv = jnp.clip(
                    jnp.maximum(cr, jnp.maximum(cg, cb)), 0.05, 1.0
                )
                u = _u01(pix, ctr, 7)
                roll = i_f >= opts.russian_roulette_depth
                # boolean algebra, not select_n over i1 (Mosaic can't)
                survive = jnp.logical_or(
                    jnp.logical_not(roll), u < p_surv
                )
                boost = jnp.where(roll & survive & scat, 1.0 / p_surv, 1.0)
                cr = cr * boost
                cg = cg * boost
                cb = cb * boost
                scat = scat & survive

            # per-lane depth exhaustion (shader.frag:338 quirk): a lane
            # completing bounce max_depth-1 ends its sample; the reference
            # returns the accumulated throughput, the book returns black
            exhausted = scat & (i_f >= jnp.float32(max_depth - 1))
            if not opts.exhaust_black:
                con_r = jnp.where(exhausted, cr, con_r)
                con_g = jnp.where(exhausted, cg, con_g)
                con_b = jnp.where(exhausted, cb, con_b)
            scat_cont = scat & jnp.logical_not(exhausted)

            # fold contributions into the lane's CURRENT pixel slot (con_*
            # are zero on non-terminating and dead lanes). Emits LINEAR
            # SUMS; scaling + gamma happen in the host-side finalize so
            # spp chunks can be accumulated across launches. Per-pixel
            # addition order equals the per-sample order of the register-
            # accumulator form — bitwise-identical images.
            for k in range(k_slots):
                out_ref[0, 3 * k] = out_ref[0, 3 * k] + con_r * ohk[k]
                out_ref[0, 3 * k + 1] = (
                    out_ref[0, 3 * k + 1] + con_g * ohk[k]
                )
                out_ref[0, 3 * k + 2] = (
                    out_ref[0, 3 * k + 2] + con_b * ohk[k]
                )

            # regeneration: terminated lanes with samples remaining start
            # the next sample this iteration; lanes whose samples ran out
            # advance to their next pixel slot (monotone into the padding
            # suffix, so an out-of-image slot ends the lane for good)
            done = ab & jnp.logical_not(scat_cont)
            if adaptive:
                # per-sample convergence stats: completed-sample count and
                # luminance^2 sums (con_* is this sample's contribution —
                # zero for absorbed/RR-killed samples, which is the
                # correct sample value for the variance estimate)
                lum = (con_r + con_g + con_b) * jnp.float32(1.0 / 3.0)
                l2 = lum * lum
                df = done.astype(jnp.float32)
                for k in range(k_slots):
                    out_ref[0, 4 * k_slots + k] = (
                        out_ref[0, 4 * k_slots + k] + df * ohk[k]
                    )
                    out_ref[0, 5 * k_slots + k] = (
                        out_ref[0, 5 * k_slots + k] + l2 * ohk[k]
                    )
            s_f = s_f + done.astype(jnp.float32)
            if adaptive and permuted:
                # per-slot sample budgets (0 = converged pixel). The plan
                # packs converged pixels LAST, so along a lane's K slots
                # budgets are monotone non-increasing and a single
                # advance step is sound (same invariant as padding).
                def bud_of(kf):
                    if k_slots == 1:
                        return budk[0]
                    b = zero
                    for k in range(k_slots):
                        b = b + (
                            kf == jnp.float32(k)
                        ).astype(jnp.float32) * budk[k]
                    return b

                bud = bud_of(k_f)
                if k_slots > 1:
                    adv = done & (s_f >= bud)
                    k_f = k_f + adv.astype(jnp.float32)
                    s_f = jnp.where(adv, zero, s_f)
                    bud = bud_of(k_f)
                px2, py2, pix2, in2 = pixel_state(k_f)
                regen = (
                    done & (s_f < bud)
                    & (k_f < jnp.float32(k_slots)) & in2
                )
            else:
                if k_slots > 1:
                    adv = done & (s_f >= jnp.float32(spp))
                    k_f = k_f + adv.astype(jnp.float32)
                    s_f = jnp.where(adv, zero, s_f)
                px2, py2, pix2, in2 = pixel_state(k_f)
                regen = (
                    done & (s_f < jnp.float32(spp))
                    & (k_f < jnp.float32(k_slots)) & in2
                )
            nox, noy, noz, ndx2, ndy2, ndz2 = gen_ray(s_f, px2, py2, pix2)

            ox = jnp.where(scat_cont, hpx, ox)
            oy = jnp.where(scat_cont, hpy, oy)
            oz = jnp.where(scat_cont, hpz, oz)
            dx = jnp.where(scat_cont, ndx, dx)
            dy = jnp.where(scat_cont, ndy, dy)
            dz = jnp.where(scat_cont, ndz, dz)
            ox = jnp.where(regen, nox, ox)
            oy = jnp.where(regen, noy, oy)
            oz = jnp.where(regen, noz, oz)
            dx = jnp.where(regen, ndx2, dx)
            dy = jnp.where(regen, ndy2, dy)
            dz = jnp.where(regen, ndz2, dz)
            cr = jnp.where(regen, one, cr)
            cg = jnp.where(regen, one, cg)
            cb = jnp.where(regen, one, cb)
            i_f = jnp.where(scat_cont, i_f + 1.0, i_f)
            i_f = jnp.where(regen, zero, i_f)

            # --- INTERNAL tail slope probes (TraceOptions.pad_*) --------
            # Each replay folds through a select whose predicate is FALSE
            # at runtime but opaque at compile time (the compiler cannot
            # range-analyze through the hash chain or loop carries), so
            # the replayed work is pure measured cost and the render
            # stays bitwise- and segment-identical
            # (test_tail_pad_knobs_are_invariant).
            for j in range(opts.pad_rng):
                salt = 1009 + 16 * j
                pvx, pvy, pvz = _unit_vec(pix, ctr, salt)
                psx, psy, psz = _unit_sphere(pix, ctr, salt + 3)
                pgu = _u01(pix, ctr, salt + 6)
                pru = _u01(pix, ctr, salt + 7)
                # unit components in [-1, 1], u01 in [0, 1): sum > -7
                ghost = (pvx + pvy + pvz + psx + psy + psz
                         + pgu + pru) < jnp.float32(-9.0)
                cr = jnp.where(ghost, zero, cr)
            if opts.pad_accum:
                # i_f >= 0 always (init 0, +1 / reset-to-0 only): zm = 0
                # at runtime, and con_* >= 0 so x + con·0 is bitwise x
                zm = (i_f < jnp.float32(-0.5)).astype(jnp.float32)
                ohz = [ohk[k] * zm for k in range(k_slots)]
                for j in range(opts.pad_accum):
                    for k in range(k_slots):
                        out_ref[0, 3 * k] = (
                            out_ref[0, 3 * k] + con_r * ohz[k]
                        )
                        out_ref[0, 3 * k + 1] = (
                            out_ref[0, 3 * k + 1] + con_g * ohz[k]
                        )
                        out_ref[0, 3 * k + 2] = (
                            out_ref[0, 3 * k + 2] + con_b * ohz[k]
                        )
            for j in range(opts.pad_genray):
                gox, goy, goz, pgdx, pgdy, pgdz = gen_ray(
                    s_f + jnp.float32(7001 + j), px2, py2, pix2
                )
                # camera rays are finite, |component| << 1e30
                ghost = (gox + goy + goz + pgdx + pgdy + pgdz
                         ) < jnp.float32(-1e30)
                ox = jnp.where(ghost, gox, ox)

            if cluster:
                # mid-walk lanes stay alive; completed-bounce lanes reset
                # their cluster-walk state to fresh for the next bounce
                # (continue from the hit point, or a regenerated ray)
                alive = (
                    scat_cont | regen | (alive_b & jnp.logical_not(bdone))
                ).astype(jnp.float32)
                bq = jnp.where(ab, FILLQ, bq)
                bs = jnp.where(ab, zero, bs)
                if opts.cluster_packed_key:
                    kl = jnp.where(ab, jnp.float32(-3e38), kl)
                    return (ox, oy, oz, dx, dy, dz, cr, cg, cb,
                            s_f, i_f, k_f, alive, segs, bq, bs, kl)
                ql = jnp.where(ab, jnp.float32(-3e38), ql)
                il = jnp.where(ab, -one, il)
                return (ox, oy, oz, dx, dy, dz, cr, cg, cb,
                        s_f, i_f, k_f, alive, segs, bq, bs, ql, il)
            alive = (scat_cont | regen).astype(jnp.float32)

            if has_self:
                # remember the winner this lane just bounced off: the
                # origin now sits on ITS surface, so next iteration's
                # self-test targets it (regen lanes reset i_f to 0, which
                # masks the stale values until their first hit)
                p_cx = jnp.where(scat_cont, scx, p_cx)
                p_cy = jnp.where(scat_cont, scy, p_cy)
                p_cz = jnp.where(scat_cont, scz, p_cz)
                p_ir = jnp.where(scat_cont, inv_r, p_ir)
                p_k1 = jnp.where(scat_cont, k1_w, p_k1)
                p_mt = jnp.where(scat_cont, mat, p_mt)
                p_ar = jnp.where(scat_cont, al_r, p_ar)
                p_ag = jnp.where(scat_cont, al_g, p_ag)
                p_ab = jnp.where(scat_cont, al_b, p_ab)
                p_fz = jnp.where(scat_cont, fuzz, p_fz)
                p_rf = jnp.where(scat_cont, refr, p_rf)
                return (ox, oy, oz, dx, dy, dz, cr, cg, cb,
                        s_f, i_f, k_f, alive, segs,
                        p_cx, p_cy, p_cz, p_ir, p_k1, p_mt,
                        p_ar, p_ag, p_ab, p_fz, p_rf)
            return (ox, oy, oz, dx, dy, dz, cr, cg, cb,
                    s_f, i_f, k_f, alive, segs)

        alive0 = in0.astype(jnp.float32)
        if adaptive and permuted:
            # converged (budget-0) slots pack last in the plan, so a lane
            # whose FIRST slot has no budget has nothing to do at all
            alive0 = alive0 * (budk[0] > 0.0).astype(jnp.float32)
        init = (ox, oy, oz, dx, dy, dz, one, one, one,
                s_f0, zero, zero, alive0,
                jnp.float32(0.0))
        if has_self:
            init = init + (zero,) * 11
        if cluster:
            # (best q, winner slot, visited cursor — one packed key or
            # a (q, idx) pair) — all lanes start FRESH (cursor at -inf)
            init = init + (
                jnp.full((r_sub, LANES), FILLQ), zero,
                jnp.full((r_sub, LANES), jnp.float32(-3e38)),
            )
            if not opts.cluster_packed_key:
                init = init + (-one,)
        final = jax.lax.while_loop(live_cond, body, init)
        segs = final[13]
        # last channel carries this tile's segment count (scalar,
        # broadcast) — SMEM (1,1) output blocks aren't supported by the
        # TPU lowering
        out_ref[0, nacc * k_slots] = jnp.full((r_sub, LANES), segs)

    return kernel


def _params_table_t(scene: Scene) -> jnp.ndarray:
    """(3, 16, S_pad) transposed gather table in EXACT 3-term bf16 split form.

    Planes 0 / 1 / 2 are the hi / mid / lo bf16 components of
    [cx, cy, cz, 1/r (signed), mat, albedo rgb, fuzz, refraction index]
    (padded to 16): x = hi + mid + lo with each term bf16-representable
    (round-to-nearest splitting leaves ≤8 significant bits per term), so
    three single-pass DEFAULT-precision MXU matmuls against a one-hot
    reconstruct the exact f32 parameter — half the passes of HIGHEST."""
    s_pad = _pad_spheres(scene.count)
    # row 10 is k1 from the SHARED _slot_encoding: the split-scan
    # self-test recomputes this sphere's quadratic from gathered params
    # and must be bitwise-equal to the scan's (_sphere_table)
    _, _, k1 = _slot_encoding(scene)
    # 1/r must stay FINITE even for degenerate slots: an inf anywhere in
    # the gather table becomes NaN in the bf16 split (inf - inf), and the
    # one-hot matmul's NaN·0 then poisons EVERY lane's gathered params —
    # a zero-radius sphere (e.g. an interactive radius edit passing
    # through 0) may never win a hit, but its table entry still
    # contaminates the sums
    r = scene.radius
    inv_r = jnp.where(r == 0.0, 1.0, 1.0 / jnp.where(r == 0.0, 1.0, r))
    rows = jnp.stack(
        [
            scene.center[:, 0],
            scene.center[:, 1],
            scene.center[:, 2],
            inv_r,
            scene.material_type.astype(jnp.float32),
            scene.albedo[:, 0],
            scene.albedo[:, 1],
            scene.albedo[:, 2],
            scene.fuzz,
            scene.refraction_index,
            k1,
            # row 11: sphere uuid (slot index) for the in-kernel debug
            # selection outline (u_selected_object, shader.frag:101/313)
            # — exact through the bf16 split like every other row; the
            # debug path disables the containable permutation so slot
            # index == the user-visible sphere id (picking parity)
            jnp.arange(scene.count, dtype=jnp.float32),
        ]
    ).astype(jnp.float32)
    rows = jnp.pad(rows, ((0, 4), (0, s_pad - scene.count)))
    # The bf16 rounding is done with integer bit ops, NOT astype round-trips:
    # inside jit, XLA's excess-precision simplifier folds f32->bf16->f32
    # conversion pairs into the identity, which silently turns the split
    # into [rows, 0, 0] and makes the kernel's DEFAULT-precision matmul
    # truncate full-precision values (measured wrong images on device).
    def to_bf16_f32(x):  # round-to-nearest-even, result bf16-representable
        xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
        xi = xi + jnp.uint32(0x7FFF) + ((xi >> 16) & jnp.uint32(1))
        return jax.lax.bitcast_convert_type(
            xi & jnp.uint32(0xFFFF0000), jnp.float32
        )

    hi = to_bf16_f32(rows)
    r1 = rows - hi
    mid = to_bf16_f32(r1)
    lo = r1 - mid
    # leading-dim stack, NOT a (48, S) concatenation: sublane-offset slices
    # of a VMEM ref feeding the MXU miscompile silently (same family as the
    # select_n sublane-broadcast pitfall); prm_ref[i] block indexing is safe
    return jnp.stack([hi, mid, lo], axis=0)


def _pad_spheres(n: int) -> int:
    """Sphere rows pad to a sublane multiple (min f32 tile is (8, 128))."""
    return max(8, -(-n // 8) * 8)


def _mxu_scan_table(scene: Scene) -> jnp.ndarray:
    """(2, S_pad, 4) f32 A-matrices for the MXU scan offload.

    Plane 0 = [cx, cy, cz, 1]: against B1 = [dx; dy; dz; −o·d] the matmul
    yields nb = c·d − o·d directly. Plane 1 = [cx, cy, cz, −k1/2]:
    against B2 = [ox; oy; oz; 1] it yields c·o − k1/2, so
    c_coef = |o|² − 2·(c·o − k1/2) = |o|² − 2 c·o + k1 costs one fma.
    Uses the shared :func:`_slot_encoding` (inactive slots center 0,
    k1 = +1 ⇒ plane-1 col 3 = −0.5, still unhittable: disc < 0 by
    Cauchy-Schwarz survives the bf16 rounding since every term rounds
    consistently). Leading-dim stack for the same sublane-offset-slice
    reason as :func:`_params_table_t`."""
    act, c, k1 = _slot_encoding(scene)
    n = scene.count
    a1 = jnp.concatenate([c, jnp.ones((n, 1), jnp.float32)], axis=1)
    a2 = jnp.concatenate([c, (-0.5 * k1)[:, None]], axis=1)
    s_pad = _pad_spheres(n)
    if s_pad != n:
        pad1 = jnp.zeros((s_pad - n, 4), jnp.float32).at[:, 3].set(1.0)
        pad2 = jnp.zeros((s_pad - n, 4), jnp.float32).at[:, 3].set(-0.5)
        a1 = jnp.concatenate([a1, pad1], axis=0)
        a2 = jnp.concatenate([a2, pad2], axis=0)
    return jnp.stack([a1, a2], axis=0)


def _cluster_partition(scene: Scene, opts: TraceOptions):
    """Host-side build of the gathered-cluster-scan partition, or None.

    None when the scene is traced (the partition is data-dependent host
    work — progressive factories and shard_map bodies fall back to the
    flat scan), when there are no small-sphere clusters (globals-only
    scenes ARE the flat scan), or when the partition doesn't fit the
    kernel's per-lane addressing (K > LANES: a gather index selects one
    lane of a 128-lane bound bank). The two-level global/cluster split
    replaces the reference's test-everything-every-bounce loop
    (static/shader.frag:182-193) with work proportional to what each
    ray's own geometry can actually hit."""
    try:
        host = jax.tree_util.tree_map(
            np.asarray, jax.device_get(scene)
        )  # ONE transfer; raises on traced values
    except Exception:
        return None
    from raytracer_tpu.scene.accel import build_grid_clustered

    g = build_grid_clustered(
        host, cell_size=opts.cluster_cell, group=opts.cluster_group,
        partition=opts.cluster_partition,
    )
    k = g.bounds.shape[0]
    if k == 0 or k > LANES:
        return None
    return g


def _part_bounds(part, opts: TraceOptions):
    """Broad-phase bound table of a partition per opts.cluster_bounds:
    (K, 4) bound spheres or (K, 6) member AABBs (see _cluster_tables)."""
    return part.boxes if opts.cluster_bounds == "box" else part.bounds


def _cluster_reorder(scene: Scene, uuid) -> Scene:
    """Reorder a (possibly TRACED) scene into a prebuilt partition's slot
    layout — the progressive static-hint path (``static_cluster`` in
    :func:`render_image_pallas`): the partition's uuid/bounds were built
    once from concrete hints at factory time, and each frame's traced
    scene values are gathered into that fixed layout here. Fill values
    mirror ``scene/accel.py build_grid_clustered`` exactly (padding
    slots inactive, radius/refraction 1 so reciprocals stay finite)."""
    safe = jnp.maximum(uuid, 0)
    live = uuid >= 0

    def take(a, fill):
        g = a[safe]
        mask = live[:, None] if g.ndim == 2 else live
        return jnp.where(mask, g, jnp.asarray(fill, g.dtype))

    return Scene(
        center=take(scene.center, 0.0),
        radius=take(scene.radius, 1.0),
        material_type=take(scene.material_type, 0),
        albedo=take(scene.albedo, 0.0),
        fuzz=take(scene.fuzz, 0.0),
        refraction_index=take(scene.refraction_index, 1.0),
        active=live.astype(jnp.float32),
    )


def _cluster_tables(scene: Scene, bounds, uuid, n_global: int,
                    group: int, r_sub: int,
                    pad_k: int = 0, pad_group: int = 0,
                    pad_banks: int = 0):
    """Device tables of the gathered cluster scan (see _make_kernel).

    - btab (K_pad, 4) bound SPHERES [bcx, bcy, bcz, bk1] (bk1 = |bc|² −
      br²) or (K_pad, 6) member AABBs [lo xyz, hi xyz] when ``bounds``
      has 6 columns (TraceOptions.cluster_bounds='box'); empty/padding
      clusters are encoded unhittable — sphere rows like
      _slot_encoding's inactive slots, box rows as the degenerate
      distant point lo = hi = 1e9 (its entry q lands beyond the
      kernel's 1e20 candidate cutoff without producing f32 infs).
    - mtab (group·4, r_sub, LANES): member exact-test params — row
      4m+p holds param p ∈ [cx, cy, cz, k1] of every cluster's m-th
      member at that cluster's LANE, pre-broadcast over sublanes (the
      kernel's lane-axis ``take_along_axis`` needs table.shape ==
      idx.shape, and an in-kernel sublane broadcast of a row slice is
      the known Mosaic "Sublane broadcast" trap). Lanes ≥ K are
      unhittable.
    - wtab (11*n_banks, r_sub, LANES): winner params [cx, cy, cz,
      inv_r (signed), mat, albedo rgb, fuzz, refraction, uuid] over all
      slots, banked by 128 for the banked per-lane gather.
    - gflat (4·n_global,): the GLOBAL spheres' [cx, cy, cz, k1],
      appended to the SMEM camera uniforms (slot _UNI_GLOBALS on)."""
    k = bounds.shape[0]
    # pad_k / pad_group: extra unhittable rows for the cost-slope probe
    # (TraceOptions.cluster_pad_k / cluster_pad_group)
    k_pad = max(8, -(-k // 8) * 8) + 8 * pad_k
    act, c, k1 = _slot_encoding(scene)
    n_slots = scene.count
    if bounds.shape[1] == 6:
        btab = bounds.astype(jnp.float32)
        if k_pad != k:
            pad = jnp.full((k_pad - k, 6), 1e9, jnp.float32)
            btab = jnp.concatenate([btab, pad], axis=0)
    else:
        br = bounds[:, 3]
        okb = br > 0.0
        bc = jnp.where(okb[:, None], bounds[:, :3], 0.0)
        bk1 = jnp.where(okb, jnp.sum(bc * bc, axis=-1) - br * br, 1.0)
        btab = jnp.concatenate(
            [bc, bk1[:, None]], axis=1
        ).astype(jnp.float32)
        if k_pad != k:
            pad = jnp.zeros((k_pad - k, 4), jnp.float32).at[:, 3].set(1.0)
            btab = jnp.concatenate([btab, pad], axis=0)

    mc = c[n_global:].reshape(k, group, 3)
    mk1 = k1[n_global:].reshape(k, group)
    vals = jnp.concatenate([mc, mk1[..., None]], axis=-1)
    vals = vals.transpose(1, 2, 0).reshape(group * 4, k)
    fill = jnp.zeros((group * 4, LANES - k), jnp.float32)
    fill = fill.at[3::4, :].set(1.0)  # k1 rows: unhittable
    mrows = jnp.concatenate([vals, fill], axis=1)
    if pad_group:
        # extra unhittable member slots (rows 4·group .. 4·group_total):
        # c = 0, k1 = 1 ⇒ disc = (o·d)² − (d·d)(o·o + 1) < 0 for every
        # real ray (Cauchy-Schwarz) — never a candidate, pure cost
        extra = jnp.zeros((pad_group * 4, LANES), jnp.float32)
        extra = extra.at[3::4, :].set(1.0)
        mrows = jnp.concatenate([mrows, extra], axis=0)
    mtab = jnp.broadcast_to(
        mrows[:, None, :],
        ((group + pad_group) * 4, r_sub, LANES),
    )

    r = scene.radius
    # signed: reproduces the negative-radius normal flip (as _sphere_table)
    inv_r = jnp.where(r == 0.0, 1.0, 1.0 / jnp.where(r == 0.0, 1.0, r))
    win = jnp.stack(
        [
            c[:, 0], c[:, 1], c[:, 2], inv_r,
            scene.material_type.astype(jnp.float32),
            scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
            scene.fuzz, scene.refraction_index,
            uuid.astype(jnp.float32),
        ],
        axis=0,
    )
    n_banks = -(-n_slots // LANES)
    pad_n = n_banks * LANES - n_slots
    if pad_n:
        padw = jnp.zeros((11, pad_n), jnp.float32)
        padw = padw.at[3].set(1.0)    # inv_r finite
        padw = padw.at[10].set(-1.0)  # uuid: no sphere
        win = jnp.concatenate([win, padw], axis=1)
    if pad_banks:
        # cluster_pad_banks: whole zero banks past every selectable
        # slot id — pure measured gather+select cost in the winner loop
        win = jnp.concatenate(
            [win, jnp.zeros((11, pad_banks * LANES), jnp.float32)],
            axis=1,
        )
    # FLAT 3-D layout (row = p·banks + b), matching mem_ref: the 4-D
    # (11, banks, r, L) form made every win_ref[p, b] slice ~4x the
    # cost of a mem_ref[row] gather (measured 179 vs ~24 ms per bank,
    # scripts/probe_cluster_slopes.py round 5)
    wtab = jnp.broadcast_to(
        win.reshape(11 * (n_banks + pad_banks), 1, LANES),
        (11 * (n_banks + pad_banks), r_sub, LANES),
    )

    gflat = jnp.concatenate(
        [c[:n_global], k1[:n_global, None]], axis=1
    ).reshape(-1)
    return btab, mtab, wtab, gflat


def _containable_split(scene: Scene, dcam: DerivedCamera, opts: TraceOptions):
    """Static scene analysis: which spheres can contain a ray origin?

    The quadratic's far-root fallback (shader.frag:157-165) is only ever
    the closest legitimate hit when the ray STARTS strictly inside the
    sphere. Ray origins are (a) the camera origin ± its lens disc and
    (b) hit points, which lie on sphere surfaces. So sphere j is
    "containable" iff it is glass (rays legally refract into it or
    reflect inside, and its exit needs the far root), another ACTIVE
    sphere's surface passes through its interior (a bounce off sphere i
    can then start inside j), or the camera's lens disc reaches inside it.
    Everything else can skip the far-root ops in the scan.

    Returns ``(perm, g_full)`` — a sphere permutation putting containable
    spheres first and the (sublane-aligned) count of full-logic slots —
    or ``None`` when the scene/camera are traced values (inside jit: no
    static analysis; the kernel keeps full logic) or analysis is disabled.

    Caveat (documented in FIDELITY.md): hit points computed in f32 can
    land O(1e-4·scale) inside a sphere whose surface is merely TANGENT to
    the one that was hit; the pairwise test uses a 1e-4-relative margin so
    exact tangencies stay containable, but a separated-but-closer-than-
    roundoff pair could in principle differ from the full scan in a
    measure-zero set of samples (measured 0 differing pixels on the
    BASELINE scenes at 100 spp).
    """
    if scene.count <= 8:
        # one sublane strip: g_full is 0 or s_pad, and a near-only win on
        # an 8-slot scan is noise — skip the analysis' device round trip
        # (it costs more than it saves on latency-bound small renders)
        return None
    flags = _containable_flags(scene, dcam, opts)
    if flags is None:
        return None
    import numpy as np

    n_cont = int(flags.sum())
    s_pad = _pad_spheres(flags.shape[0])
    g_full = min(s_pad, _pad_spheres(max(1, n_cont)) if n_cont else 0)
    if g_full >= s_pad:
        # every slot keeps full near→far logic: the split buys nothing,
        # so skip the scene permutation (and its device round trips) —
        # matters on latency-bound small renders
        return None
    # containable first; stable so relative order is otherwise preserved
    perm = np.argsort(~flags, kind="stable")
    if np.array_equal(perm, np.arange(perm.shape[0])):
        perm = None  # already laid out containable-first: no gather ops
    return perm, g_full


def _containable_flags(scene: Scene, dcam: DerivedCamera,
                       opts: TraceOptions):
    """Per-sphere bool array of :func:`_containable_split`'s analysis, or
    None for traced inputs / disabled analysis."""
    import numpy as np

    if not opts.split_scan:
        return None
    try:
        # ONE device→host transfer for everything the analysis reads —
        # through the TPU tunnel each individual fetch costs ~50-90 ms
        c, r, act, mat, cam, lens = jax.device_get((
            scene.center, scene.radius, scene.active, scene.material_type,
            dcam.origin, dcam.lens_radius,
        ))
        c = np.asarray(c, np.float64)
        r = np.abs(np.asarray(r, np.float64))
        act = np.asarray(act, np.float64) > 0.0
        cam = np.asarray(cam, np.float64)
        lens = float(lens)
    except Exception:  # traced values inside jit — no static analysis
        return None
    # f32 hit points on sphere i wander off its surface by roughly
    # eps32 * (|c_i| + r_i) through the quadratic's cancellation
    # (measured ~1e-6 x scale; 4.3e-4 on a radius-30 sphere 400 from the
    # origin). delta is that bound with 10x headroom: a bounce off i can
    # start that deep inside a neighbor, so the pairwise test inflates by
    # it. Same-sphere re-entry needs no margin — the kernel runs an exact
    # per-lane far-root SELF-test of the last-hit sphere every iteration.
    from raytracer_tpu.scene import materials

    delta = 1e-5 * (np.linalg.norm(c, axis=-1) + r + 1.0)
    # glass spheres (static/shader.frag:47)
    containable = act & (mat == materials.GLASS)
    # camera (or any lens sample) inside — lens-ray origins are computed
    # in f32 (origin + u·rdx + v·rdy), so inflate by the same
    # scale-relative roundoff bound the pairwise test uses
    cam_delta = 1e-5 * (np.linalg.norm(cam) + 1.0)
    containable |= act & (
        np.linalg.norm(c - cam[None, :], axis=-1)
        < r + lens + cam_delta + 1e-4
    )
    # another active sphere's surface inside: shell_i crosses ball_j
    # iff | |ci-cj| - ri | < rj (inflated by delta_i so roundoff-deep
    # landings count; exact tangencies are inside the margin)
    dist = np.linalg.norm(c[:, None, :] - c[None, :, :], axis=-1)
    crosses = np.abs(dist - r[:, None]) < (r[None, :] + delta[:, None]
                                           + 1e-4)
    np.fill_diagonal(crosses, False)
    containable |= act & (crosses & act[:, None]).any(axis=0)
    return containable


def _slot_encoding(scene: Scene):
    """(act, zeroed centers, k1) shared by ``_sphere_table`` (the scan)
    and ``_params_table_t`` (the gather): the split-scan self-test's
    strict-< tie-break relies on the two tables' k1 being computed with
    BITWISE-identical arithmetic, so there is exactly one copy of it.

    Inactive slots (and slots beyond MAX_T of the origin) are encoded
    geometrically unhittable: center=(0,0,0), k1=+1 ⇒ disc < 0 for every
    ray by Cauchy-Schwarz."""
    act = (scene.active > 0.0) & (
        jnp.linalg.norm(scene.center, axis=-1) - jnp.abs(scene.radius)
        <= MAX_T
    )
    c_act = jnp.where(act[:, None], scene.center, 0.0)
    k1 = jnp.where(
        act,
        jnp.sum(c_act * c_act, axis=-1) - scene.radius * scene.radius,
        1.0,
    )
    return act, c_act, k1


def _sphere_table(scene: Scene) -> jnp.ndarray:
    """(S_pad, 12) f32 column table with precomputed per-sphere constants.

    Inactive slots (and padding) are encoded as GEOMETRICALLY unhittable:
    center=(0,0,0) with k1 = |c|^2 - r^2 = +1 (i.e. r^2 = -1) makes the
    discriminant (o·d)^2 - |d|^2(|o|^2 + 1) < 0 for every ray by
    Cauchy-Schwarz — the scan needs no per-sphere active test.

    Spheres entirely beyond MAX_T of the world origin are also encoded
    unhittable: the kernel's scan has no per-ray upper t bound (the
    shader's t_max test, shader.frag:157 — dropped because no-hit is
    detected from the fill value instead), so MAX_T acts as a world-extent
    bound here rather than a per-ray clip. Scenes are orders of magnitude
    smaller than MAX_T=1e5; the jnp tracer keeps the exact per-ray
    semantics."""
    act, c, k1 = _slot_encoding(scene)
    r = scene.radius
    # signed: reproduces negative-radius normal flip; finite for r == 0
    inv_r = jnp.where(r == 0.0, 1.0, 1.0 / jnp.where(r == 0.0, 1.0, r))
    table = jnp.stack(
        [
            c[:, 0],
            c[:, 1],
            c[:, 2],
            k1,
            inv_r,
            scene.material_type.astype(jnp.float32),
            scene.albedo[:, 0],
            scene.albedo[:, 1],
            scene.albedo[:, 2],
            scene.fuzz,
            scene.refraction_index,
            scene.active,
        ],
        axis=-1,
    )
    s_pad = _pad_spheres(scene.count)
    if s_pad != scene.count:
        pad = jnp.zeros((s_pad - scene.count, 12), jnp.float32)
        pad = pad.at[:, 3].set(1.0)  # k1: unhittable
        pad = pad.at[:, 4].set(1.0)  # inv_r finite
        table = jnp.concatenate([table, pad], axis=0)
    return table


def _camera_uniforms(dcam: DerivedCamera, debug=None) -> jnp.ndarray:
    parts = [
        dcam.origin,
        dcam.lower_left_corner,
        dcam.horizontal,
        dcam.vertical,
        dcam.u,
        dcam.v,
        dcam.lens_radius[None],
    ]
    if debug is not None:
        # slots 19-22: u_cursor_point / u_selected_object analogs
        # (src/webgl.rs:579-590) for the in-kernel debug overlay
        parts.append(jnp.asarray(debug.cursor_point, jnp.float32))
        parts.append(
            jnp.asarray(debug.selected_object, jnp.float32)[None]
        )
    u = jnp.concatenate(parts).astype(jnp.float32)
    return jnp.pad(u, (0, 32 - u.shape[0]))


def _render_chunk_impl(
    scene: Scene,
    dcam: DerivedCamera,
    seed,
    sample_offset,
    width: int,
    height: int,
    chunk_spp: int,
    opts: TraceOptions,
    r_sub: int,
    interpret: bool,
    local_height: int | None = None,
    row_offset=0,
    pixel_map=None,
    k_slots: int = 1,
    g_full: int | None = None,
    debug=None,
    caux=None,
    n_global: int = 0,
):
    """One kernel launch tracing chunk_spp samples of k_slots pixels per
    lane; returns (nt, 4K+1, r, l): channels [0,3K) slot-major linear rgb
    sums, [3K,4K) per-slot per-lane path cost, 4K per-tile segment counts.
    Tiles are rectangular (k_slots·r_sub x LANES)-pixel blocks over a
    padded 2-D grid.

    ``local_height``/``row_offset`` render a horizontal band of the full
    image (the shard_map rows-sharded path); geometry and RNG match the
    single-chip render exactly. ``pixel_map`` (nt, 2, k_slots, r_sub,
    LANES) i32 overrides the lane→pixel assignment (profile-guided
    sorting). ``caux`` = (bounds, uuid) of a host-built cluster
    partition (with its static ``n_global``) switches the kernel to the
    gathered cluster scan — ``scene`` must then be the partition's
    REORDERED scene (globals first, then cluster members)."""
    tiles_x = pl.cdiv(width, LANES)
    tiles_y = pl.cdiv(local_height or height, k_slots * r_sub)
    nt = tiles_x * tiles_y
    adaptive = opts.adaptive_tolerance > 0.0
    nacc = 6 if adaptive else 4
    nc = nacc * k_slots + 1
    cdims = None
    if caux is not None:
        bounds, uuid = caux
        k = bounds.shape[0]
        n_banks_w = -(-scene.count // LANES)
        cdims = (
            max(8, -(-k // 8) * 8) + 8 * opts.cluster_pad_k,  # K_pad
            n_global,
            opts.cluster_group,
            n_banks_w,
            opts.cluster_group + opts.cluster_pad_group,
            (n_global + opts.cluster_pad_global) if n_global else 0,
            n_banks_w + opts.cluster_pad_banks,
        )
    kernel = _make_kernel(
        _pad_spheres(scene.count), chunk_spp, opts.max_depth, r_sub, width,
        height, opts, tiles_x, permuted=pixel_map is not None,
        k_slots=k_slots, g_full=g_full, adaptive=adaptive, cdims=cdims,
    )
    seeds = jnp.stack([
        seed,
        jnp.asarray(sample_offset, jnp.int32),
        jnp.asarray(row_offset, jnp.int32),
    ])
    if caux is not None:
        btab, mtab, wtab, gflat = _cluster_tables(
            scene, bounds, uuid, n_global, opts.cluster_group, r_sub,
            pad_k=opts.cluster_pad_k, pad_group=opts.cluster_pad_group,
            pad_banks=opts.cluster_pad_banks,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # uniforms + globals
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [seed, offset, row]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bounds (K_pad, 4)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # members (4g, r, l)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # winner banks
        ]
        args = [
            jnp.concatenate([_camera_uniforms(dcam, debug), gflat]),
            seeds, btab, mtab, wtab,
        ]
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # camera uniforms (32,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [seed, offset, row]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sphere table (S_pad, 12)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params^T (16, S_pad)
        ]
        args = [_camera_uniforms(dcam, debug), seeds, _sphere_table(scene),
                _params_table_t(scene)]
    if opts.scan_mxu:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(_mxu_scan_table(scene))
    if pixel_map is not None:
        # planes: [ipx, ipy] (+ per-slot sample budget when adaptive)
        nplanes = 3 if adaptive else 2
        in_specs.append(
            pl.BlockSpec(
                (1, nplanes, k_slots, r_sub, LANES),
                lambda i: (i, 0, 0, 0, 0),
            )
        )
        args.append(pixel_map)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nc, r_sub, LANES), lambda i: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((nt, nc, r_sub, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, r_sub, LANES), jnp.float32)],
        interpret=interpret,
    )(*args)


_render_chunk = functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "chunk_spp", "opts", "r_sub", "interpret",
        "local_height", "k_slots", "g_full", "n_global",
    ),
)(_render_chunk_impl)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "chunk_spp", "opts", "r_sub", "interpret",
        "k_slots", "g_full", "local_height", "n_global",
    ),
)
def _render_chunk_profiled(
    scene: Scene,
    dcam: DerivedCamera,
    seed,
    width: int,
    height: int,
    chunk_spp: int,
    opts: TraceOptions,
    r_sub: int,
    interpret: bool,
    k_slots: int,
    g_full: int | None,
    debug=None,
    sample_offset=0,
    local_height: int | None = None,
    row_offset=0,
    caux=None,
    n_global: int = 0,
):
    """The profile chunk FUSED with its plan: one device program renders
    the first (unsorted) chunk and turns its per-pixel path costs into the
    first sorted-render plan — no intermediate dispatch. The keyword tail
    (sample_offset / local_height / row_offset) serves the sharded band
    path, which runs this same machinery shard-locally."""
    out0 = _render_chunk_impl(
        scene, dcam, seed, sample_offset, width, height, chunk_spp, opts,
        r_sub, interpret, local_height=local_height, row_offset=row_offset,
        k_slots=k_slots, g_full=g_full, debug=debug, caux=caux,
        n_global=n_global,
    )
    return _profile_to_plan(
        out0, width, local_height if local_height is not None else height,
        r_sub, k_slots, row_offset, opts.row_block_stride,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "chunk_spp", "opts", "r_sub", "interpret",
        "k_slots", "plan_next", "g_full", "n_global",
    ),
    donate_argnums=(4, 5),
)
def _render_chunk_sorted(
    scene: Scene,
    dcam: DerivedCamera,
    seed,
    sample_offset,
    acc,
    segments,
    inv,
    pixel_map,
    width: int,
    height: int,
    chunk_spp: int,
    opts: TraceOptions,
    r_sub: int,
    interpret: bool,
    k_slots: int,
    plan_next: bool,
    g_full: int | None,
    debug=None,
    caux=None,
    n_global: int = 0,
):
    """One sorted-layout chunk FUSED with its accumulate + next-chunk plan:
    a single device program per chunk instead of two, halving the ~50-90 ms
    per-dispatch tunnel latency the multi-chunk loop pays. The final chunk
    passes ``plan_next=False`` and skips the two argsorts it doesn't need.

    Returns (acc, segments, inv_next, pixel_map_next) — the latter two are
    passed through unchanged when ``plan_next`` is off."""
    return _chunk_sorted_step(
        scene, dcam, seed, sample_offset, acc, segments, inv, pixel_map,
        width, height, chunk_spp, opts, r_sub, interpret, k_slots,
        plan_next, g_full, debug=debug, caux=caux, n_global=n_global,
    )


def _chunk_sorted_step(
    scene, dcam, seed, sample_offset, acc, segments, inv, pixel_map,
    width, height, chunk_spp, opts, r_sub, interpret, k_slots,
    plan_next, g_full, debug=None, local_height=None, row_offset=0,
    caux=None, n_global: int = 0,
):
    """Unjitted render→accumulate→re-plan step shared by the single-chip
    chunk-at-a-time path (via the jitted ``_render_chunk_sorted``) and
    the sharded band path (already inside shard_map's trace)."""
    out = _render_chunk_impl(
        scene, dcam, seed, sample_offset, width, height, chunk_spp, opts,
        r_sub, interpret, local_height=local_height, row_offset=row_offset,
        pixel_map=pixel_map, k_slots=k_slots, g_full=g_full, debug=debug,
        caux=caux, n_global=n_global,
    )
    acc, segments = _accumulate_sorted(out, acc, segments, inv, k_slots)
    if plan_next:
        inv, pixel_map = _plan_from_cost(acc[3], width, r_sub, k_slots,
                                         row_offset,
                                         opts.row_block_stride)
    return acc, segments, inv, pixel_map


# ---- exact segment totals --------------------------------------------
# Per-TILE segment counts leave the kernel as f32 — exact integers (one
# launch's per-tile count is bounded by the watchdog work budget, far
# below 2^24). Reducing them to a scalar in f32 is NOT exact (the cover
# render totals 1.24e9 ≫ 2^24), and worse, the ROUNDING depends on the
# pixel→tile partition: the sort plan differs between scan variants
# (the cluster profile counts walk iterations, not bounces), so the
# round-4 device A/B saw bitwise-identical images with "unequal"
# segment counts and auto-rejected the fastest variant. (The reported
# flat total 1240385792 is divisible by 128 — the f32 ulp at that
# magnitude — pure reduction rounding, not a counting defect.)
# Totals therefore ride as an int32 pair [hi, lo] (value = hi·4096 +
# lo; each component stays exact past any realistic render: bound
# ~2^31·4096 ≈ 8.8e12 segments) and round to f32 ONCE at the API
# boundary — a deterministic function of the exact integer total, so
# equal work compares equal regardless of plan, partition or chunking.


def _seg_pair(counts) -> jnp.ndarray:
    """Per-tile f32 segment counts → exact (2,) int32 [hi, lo] total
    (value hi·4096 + lo). Inputs must be exact integers < 2^24 — true
    for any single launch, and for the unsorted path's cross-chunk
    per-tile sums up to ~1500 effective spp·bounces per pixel."""
    t = counts.astype(jnp.int32)
    return jnp.stack([jnp.sum(t >> 12), jnp.sum(t & 0xFFF)])


def _seg_value(pair) -> jnp.ndarray:
    """(2,) int32 segment pair → f32 scalar total, rounding exactly
    once (deterministically) at the end."""
    hi = pair[0] + (pair[1] >> 12)
    lo = pair[1] & 0xFFF
    return hi.astype(jnp.float32) * 4096.0 + lo.astype(jnp.float32)


def _accumulate_sorted(out, acc, segments, inv, k_slots: int,
                       nacc: int = 4):
    """Fold one sorted-layout chunk's tile sums into the pixel-space
    accumulator (rgb + cumulative cost, + n/lum² when adaptive) and the
    segment counter (an exact int32 [hi, lo] pair — see _seg_pair) —
    shared by the chunk-at-a-time path and the fused lax.scan path so
    their accumulation stays op-for-op identical (bitwise image
    parity)."""
    flat = (
        _rgbc_channels(out, k_slots, nacc)
        .transpose(2, 0, 1, 3, 4)
        .reshape(nacc, -1)
    )
    acc = acc + jnp.take(flat, inv, axis=1)
    segments = segments + _seg_pair(out[:, nacc * k_slots, 0, 0])
    return acc, segments


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "gamma", "r_sub", "k_slots"),
)
def _finalize(acc, width: int, height: int, spp: int, gamma: bool,
              r_sub: int, k_slots: int = 1):
    """(nt, 4K+1, r_sub, LANES) rectangular-tile sums → (H, W, 3) image."""
    tiles_x = pl.cdiv(width, LANES)
    tiles_y = pl.cdiv(height, k_slots * r_sub)
    image = (
        acc[:, : 3 * k_slots]
        .reshape(tiles_y, tiles_x, k_slots, 3, r_sub, LANES)
        .transpose(0, 2, 4, 1, 5, 3)
        .reshape(tiles_y * k_slots * r_sub, tiles_x * LANES, 3)
        [:height, :width]
    ) * (1.0 / spp)
    if gamma:
        image = jnp.sqrt(jnp.maximum(image, 0.0))
    return image, _seg_pair(acc[:, 4 * k_slots, 0, 0])


def _rgbc_channels(out, k_slots: int, nacc: int = 4):
    """(nt, nacc·K+1, r, l) kernel output → (nt, K, nacc, r, l): per pixel
    slot, [rgb sums, path cost] (+ [n, lum²] when adaptive)."""
    nt, _, r, l = out.shape
    rgb = out[:, : 3 * k_slots].reshape(nt, k_slots, 3, r, l)
    rest = (
        out[:, 3 * k_slots : nacc * k_slots]
        .reshape(nt, nacc - 3, k_slots, r, l)
        .transpose(0, 2, 1, 3, 4)
    )
    return jnp.concatenate([rgb, rest], axis=2)


def _tiles_to_flat(out, width: int, height: int, r_sub: int, k_slots: int,
                   nacc: int = 4):
    """Kernel output tile blocks → (nacc, Hp·Wp) channel planes in
    pixel-gid order (gid = ipy·Wp + ipx over the PADDED tile grid)."""
    tiles_x = pl.cdiv(width, LANES)
    tiles_y = pl.cdiv(height, k_slots * r_sub)
    return (
        _rgbc_channels(out, k_slots, nacc)
        .reshape(tiles_y, tiles_x, k_slots, nacc, r_sub, LANES)
        .transpose(3, 0, 2, 4, 1, 5)
        .reshape(nacc, tiles_y * k_slots * r_sub * tiles_x * LANES)
    )


def _plan_from_cost(cost, width: int, r_sub: int, k_slots: int,
                    row_offset=0, block_stride: int = 1):
    """Per-pixel cumulative cost → (inv, pixel_map): pixels sorted by
    descending measured path cost, packed into tiles in that order. A
    lane's K slots take ranks (t·K + k)·N + pos for its in-tile position
    pos — K nearby draws from the sorted cost curve, so lane TOTALS
    equalize even where single-pixel predictions miss.

    ``row_offset`` (may be traced — a shard's ``axis_index`` band start)
    shifts the pixel_map's ipy to ABSOLUTE image rows: the permuted
    kernel derives RNG streams and camera st from (ipx, ipy) alone, so a
    shard's plan must name global pixels. ``inv`` stays local (it indexes
    the shard's own accumulator). ``block_stride`` > 1 is the rows-mesh
    round-robin block interleave (options.row_block_stride): local
    tile-row block j sits at absolute rows row_offset + j·stride·g +
    [0, g), g = k_slots·r_sub — the same affine map the rectangular
    kernel layout applies."""
    order = jnp.argsort(-cost)  # expensive pixels first; padding (0) last
    inv = jnp.argsort(order)
    wp = pl.cdiv(width, LANES) * LANES
    ipx = (order % wp).astype(jnp.int32)
    ly = (order // wp).astype(jnp.int32)
    if block_stride != 1:
        g = k_slots * r_sub
        ly = (ly // g) * (g * block_stride) + (ly % g)
    ipy = ly + jnp.asarray(row_offset, jnp.int32)
    nt = order.shape[0] // (k_slots * r_sub * LANES)
    pixel_map = (
        jnp.stack([ipx, ipy], axis=0)
        .reshape(2, nt, k_slots, r_sub, LANES)
        .transpose(1, 0, 2, 3, 4)
    )
    return inv, pixel_map


#: adaptive sampling: minimum samples before a pixel may be declared
#: converged, and the absolute luminance floor added to the relative
#: tolerance (so near-black pixels don't demand absurd precision)
ADAPTIVE_MIN_N = 64
#: auto adaptive chunk cap (the _chunk_schedule it feeds emits sorted
#: chunks of ~2x this): measured on the cover scene — wall keeps
#: dropping to ~16 (1.73 s at tol 0.2 vs 1.91 s at 24, quality
#: statistically indistinguishable), below which re-plan overhead eats
#: the savings; larger caps overshoot converged pixels (PERF.md
#: adaptive floor matrix)
ADAPTIVE_AUTO_CHUNK = 16
ADAPTIVE_ABS_FLOOR = 0.02
#: two-sided 97.5% Student-t quantiles indexed by CHUNK count n_c
#: (dof = n_c - 1); n_c < 3 can't form a CI (entry inf), n_c > 16
#: clamps to the last entry (conservative — t keeps shrinking toward
#: 1.96). Used by the between-chunk-mean variance estimator below.
#: Plain numpy on purpose: a module-level jnp constant would force JAX
#: backend init at import time (sitecustomize registers the TPU tunnel
#: in every process, so importing this module could dial — or, during
#: an outage, hang on — the device, and would pin the constant to
#: whatever backend was live at import). jnp.take converts it at trace
#: time inside jit with no import-time device allocation.
_T975_BY_CHUNKS = np.asarray(
    [np.inf, np.inf, np.inf, 4.303, 3.182, 2.776, 2.571, 2.447,
     2.365, 2.306, 2.262, 2.228, 2.201, 2.179, 2.160, 2.145, 2.131],
    np.float32,
)


def _plan_adaptive(acc, width: int, r_sub: int, k_slots: int, cs: int,
                   tol: float, chunk_stats=None, row_offset=0,
                   block_stride: int = 1):
    """Adaptive variant of :func:`_plan_from_cost`: pixels sorted by
    (unconverged first, then descending cost), plus a per-pixel sample
    budget plane (0 for converged pixels, ``cs`` otherwise).

    acc planes: [r, g, b, cost, n, lum2] cumulative sums. Convergence:
    n >= ADAPTIVE_MIN_N and the 95% CI half-width of mean luminance
    is within tol·(mean + ADAPTIVE_ABS_FLOOR). The CI is the MINIMUM of
    two estimators: the per-sample one (sqrt(var/n)·1.96 — exact for
    independent draws) and, when ``chunk_stats`` ([n_c, Σm, Σm²] per
    pixel, m = a full chunk's mean luminance) has n_c >= 3 chunks, a
    Student-t CI on the between-chunk-mean variance. Only the STRATIFIED
    scan passes ``chunk_stats``: its per-sample variance cannot see the
    stratification (it estimates the marginal variance, not the variance
    of the mean) while chunk means do — letting stratified renders stop
    when their TRUE error meets the tolerance, with the per-sample CI as
    a conservative upper bound (PERF.md adaptive × stratified). The
    random sampler keeps the exact per-sample CI alone: min-ing two
    independent estimates of the SAME quantity would systematically
    select the underestimate (anti-conservative coverage).

    Known approximation (ADVICE r3): the t-CI treats chunk means as iid,
    but per pixel every chunk derives from ONE Cranley-Patterson rotation
    (the only randomness), so chunk means are dependent and the rule can
    undercover beyond the usual sequential-stopping bias. This is
    accepted rather than fixed because the alternative — an independent
    rotation per chunk — re-randomizes exactly the structure that makes
    stratification converge (chunks would become plain jittered batches
    and the variance win shrinks back toward random). The realized error
    is bounded EMPIRICALLY instead: the PERF.md adaptive × stratified
    matrix measures mean|Δ| vs the same-sampler fixed render at each
    tolerance, and bench's ``adaptive_golden_mad`` gates the tol-0.2
    render against the absolute jnp rr0 golden — coverage is certified
    by measurement, not by the iid assumption.
    Padding pixels (n == 0) count as converged so they keep packing
    last — along a lane's K slots budgets stay monotone non-increasing,
    which the kernel's single advance step relies on.

    ``row_offset`` (may be traced — a shard's band start) shifts ipy to
    ABSOLUTE image rows, exactly as in :func:`_plan_from_cost`, and
    ``block_stride`` applies the same round-robin block-interleave map;
    ``inv`` stays local."""
    n = acc[4]
    n_safe = jnp.maximum(n, 1.0)
    mean = (acc[0] + acc[1] + acc[2]) * (1.0 / 3.0) / n_safe
    var = jnp.maximum(acc[5] / n_safe - mean * mean, 0.0)
    ci = 1.96 * jnp.sqrt(var / n_safe)
    if chunk_stats is not None:
        n_c = chunk_stats[0]
        nc_safe = jnp.maximum(n_c, 1.0)
        m_mean = chunk_stats[1] / nc_safe
        s2 = jnp.maximum(
            chunk_stats[2] / nc_safe - m_mean * m_mean, 0.0
        ) * nc_safe / jnp.maximum(n_c - 1.0, 1.0)
        t = jnp.take(
            _T975_BY_CHUNKS,
            jnp.clip(n_c.astype(jnp.int32), 0, _T975_BY_CHUNKS.shape[0] - 1),
        )
        ci_c = t * jnp.sqrt(s2 / nc_safe)
        ci = jnp.where(n_c >= 3.0, jnp.minimum(ci, ci_c), ci)
    converged = jnp.logical_or(
        n == 0.0,
        jnp.logical_and(
            n >= ADAPTIVE_MIN_N,
            ci <= tol * (mean + ADAPTIVE_ABS_FLOOR),
        ),
    )
    key = jnp.where(converged, jnp.float32(3e38), -acc[3])
    order = jnp.argsort(key)  # unconverged expensive first
    inv = jnp.argsort(order)
    wp = pl.cdiv(width, LANES) * LANES
    ipx = (order % wp).astype(jnp.int32)
    ly = (order // wp).astype(jnp.int32)
    if block_stride != 1:
        g = k_slots * r_sub
        ly = (ly // g) * (g * block_stride) + (ly % g)
    ipy = ly + jnp.asarray(row_offset, jnp.int32)
    budget = jnp.where(converged, 0, cs).astype(jnp.int32)[order]
    nt = order.shape[0] // (k_slots * r_sub * LANES)
    pixel_map = (
        jnp.stack([ipx, ipy, budget], axis=0)
        .reshape(3, nt, k_slots, r_sub, LANES)
        .transpose(1, 0, 2, 3, 4)
    )
    return inv, pixel_map


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "r_sub", "k_slots", "block_stride"),
)
def _profile_to_plan(out0, width: int, height: int, r_sub: int,
                     k_slots: int, row_offset=0, block_stride: int = 1):
    """Turn the profiling chunk's output into the first sorted-render plan.

    Returns (acc (4, Hp·Wp) pixel-space sums: rgb + cumulative cost,
    segments scalar, inv (Hp·Wp,) inverse lane→pixel permutation,
    pixel_map (nt, 2, k_slots, r_sub, LANES) i32 per-lane [ipx, ipy]
    assignment). ``height``/``row_offset`` are a shard's band height and
    absolute band start when called shard-locally."""
    acc = _tiles_to_flat(out0, width, height, r_sub, k_slots)
    segments = _seg_pair(out0[:, 4 * k_slots, 0, 0])
    inv, pixel_map = _plan_from_cost(acc[3], width, r_sub, k_slots,
                                     row_offset, block_stride)
    return acc, segments, inv, pixel_map


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "gamma", "r_sub", "k_slots"),
)
def _finalize_flat(acc, width: int, height: int, spp: int, gamma: bool,
                   r_sub: int, k_slots: int):
    """(3, Hp·Wp) pixel-space sums → (H, W, 3) image."""
    tiles_x = pl.cdiv(width, LANES)
    hp = pl.cdiv(height, k_slots * r_sub) * k_slots * r_sub
    image = (
        acc.reshape(3, hp, tiles_x * LANES)
        .transpose(1, 2, 0)[:height, :width]
    ) * (1.0 / spp)
    if gamma:
        image = jnp.sqrt(jnp.maximum(image, 0.0))
    return image


def _pick_chunk_spp(
    spp: int, p: int, s_count: int, max_depth: int, rr_depth: int = 0,
    cost_scale: float = 1.0,
) -> int:
    """Bound one launch's work so long renders never trip the device
    watchdog: target ~1.2e11 ray-sphere tests per launch ≈ 2 s of kernel
    time (3.2 s measured fault-free on v5e), amortizing the ~50-90 ms
    per-launch dispatch latency through the device tunnel. Larger chunks
    also shrink the per-lane sample variance that limits how well
    profile-guided pixel sorting can balance tiles. With path regeneration
    a launch's iteration count tracks E[path depth] (~3 on the cover
    scene), not the max depth over the tile, so the model uses a flat
    effective depth; ``rr_depth`` shaves the deep-tail residue further.
    ``cost_scale`` rescales the per-sample cost for kernels that do
    measurably less work per sample than the flat scan — the cluster
    path passes ``TraceOptions.cluster_chunk_cost`` (~0.5, device A/B
    in options.py) so its launches fill the same ~2 s budget."""
    eff_depth = min(max_depth, 3 if rr_depth else 4)
    per_sample = p * eff_depth * max(s_count, 1) * cost_scale
    return max(1, min(spp, int(1.2e11 // max(per_sample, 1))))


def _chunk_schedule(spp: int, chunk: int):
    """Launch schedule shared by the sorted and unsorted paths.

    Returns ``(sizes, uniform)``: per-launch spp counts summing to spp.
    The first (profile) chunk runs UNSORTED at roughly half the base
    budget; the rest are sorted chunks at up to 2x the base budget
    (balanced tiles ⇒ launch time tracks the mean lane cost). When all
    sorted chunks can be made EQUAL (``uniform=True``, found for
    practically every spp), the whole sorted run compiles into ONE
    device program (lax.scan in ``_render_chunks_scan``) instead of one
    per chunk — each dispatch through the TPU tunnel costs ~50-90 ms.
    Both render paths consume the same schedule, so sorted and unsorted
    images stay bitwise-equal (identical per-pixel accumulation order).
    """
    if spp <= chunk:
        return [spp], False
    c0p = max(1, chunk // 2)
    n0 = max(1, -(-(spp - c0p) // (2 * chunk)))
    for n in range(n0, n0 + 256):
        cs = -(-(spp - c0p) // n)
        c0 = spp - n * cs
        # cs floor: reject degenerate many-tiny-chunk schedules (e.g.
        # spp=8 chunk=3 would otherwise yield eight 1-spp launches) —
        # the legacy loop below handles those cases
        if 1 <= c0 <= chunk and max(2, chunk // 2) <= cs <= 2 * chunk:
            return [c0] + [cs] * n, True
    sizes = [c0p]
    off = c0p
    while off < spp:
        c = min(2 * chunk, spp - off)
        sizes.append(c)
        off += c
    return sizes, False


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "cs", "n", "opts", "r_sub", "interpret",
        "k_slots", "g_full", "local_height", "n_global",
    ),
    # donate only what the outputs can alias (acc, segments): inv and
    # pixel_map die inside the scan carry
    donate_argnums=(4, 5),
)
def _render_chunks_scan(
    scene: Scene,
    dcam: DerivedCamera,
    seed,
    chunk0,
    acc,
    segments,
    inv,
    pixel_map,
    width: int,
    height: int,
    cs: int,
    n: int,
    opts: TraceOptions,
    r_sub: int,
    interpret: bool,
    k_slots: int,
    g_full: int | None,
    debug=None,
    local_height: int | None = None,
    row_offset=0,
    caux=None,
    n_global: int = 0,
):
    """ALL n uniform sorted chunks in one device program: a lax.scan whose
    body is render + accumulate + next-chunk re-plan (the same fusion as
    ``_render_chunk_sorted``, across chunks). Per-pixel accumulation order
    matches the chunk-at-a-time path exactly, so images are bitwise-equal;
    the last iteration's plan is computed and discarded (one argsort —
    noise next to a chunk render). ``chunk0`` is the traced base sample
    offset (a shard folds its spp-axis offset in); local_height/row_offset
    serve the sharded band path."""

    def body(carry, i):
        acc, segments, inv, pixel_map = carry
        acc, segments, inv, pixel_map = _chunk_sorted_step(
            scene, dcam, seed, chunk0 + i * cs, acc, segments, inv,
            pixel_map, width, height, cs, opts, r_sub, interpret, k_slots,
            True, g_full, debug=debug, local_height=local_height,
            row_offset=row_offset, caux=caux, n_global=n_global,
        )
        return (acc, segments, inv, pixel_map), None

    (acc, segments, _, _), _ = jax.lax.scan(
        body, (acc, segments, inv, pixel_map),
        jnp.arange(n, dtype=jnp.int32),
    )
    return acc, segments


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "cs", "n", "opts", "r_sub", "interpret",
        "k_slots", "g_full", "n_global",
    ),
    donate_argnums=(4,),
)
def _render_chunks_scan_unsorted(
    scene: Scene,
    dcam: DerivedCamera,
    seed,
    chunk0,
    acc,
    width: int,
    height: int,
    cs: int,
    n: int,
    opts: TraceOptions,
    r_sub: int,
    interpret: bool,
    k_slots: int,
    g_full: int | None,
    debug=None,
    caux=None,
    n_global: int = 0,
):
    """ALL n uniform unsorted chunks in one device program — the
    sort_pixels-off / enable_debug analog of :func:`_render_chunks_scan`
    (offline debug renders pay the same ~50-90 ms/dispatch tunnel
    latency the sorted path stopped paying). The scan body renders a
    chunk and folds its tile sums with the same elementwise ``acc + out``
    the chunk-at-a-time loop used, in the same order, so images are
    bitwise-equal; both paths consume the same ``_chunk_schedule``, so
    sorted/unsorted bitwise equality is preserved too. ``chunk0`` is the
    traced base sample offset of the first scanned chunk."""

    def body(acc, i):
        out = _render_chunk_impl(
            scene, dcam, seed, chunk0 + i * cs, width, height, cs, opts,
            r_sub, interpret, k_slots=k_slots, g_full=g_full, debug=debug,
            caux=caux, n_global=n_global,
        )
        return acc + out, None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(n, dtype=jnp.int32))
    return acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "chunk_spp", "opts", "r_sub", "interpret",
        "k_slots", "g_full", "cs_next", "local_height", "n_global",
    ),
)
def _render_adaptive_profiled(
    scene, dcam, seed, width, height, chunk_spp, opts, r_sub, interpret,
    k_slots, g_full, cs_next, local_height=None, row_offset=0,
    caux=None, n_global: int = 0,
):
    """Adaptive profile chunk fused with its plan: renders the first
    (unsorted, full-budget) chunk, whose n/lum² channels seed the first
    convergence decision. ``local_height``/``row_offset`` serve the
    sharded band path (shard-local adaptive planning — convergence is a
    per-pixel decision, so bands decide independently)."""
    out0 = _render_chunk_impl(
        scene, dcam, seed, 0, width, height, chunk_spp, opts, r_sub,
        interpret, local_height=local_height, row_offset=row_offset,
        k_slots=k_slots, g_full=g_full, caux=caux, n_global=n_global,
    )
    acc = _tiles_to_flat(
        out0, width, local_height if local_height is not None else height,
        r_sub, k_slots, 6,
    )
    segments = _seg_pair(out0[:, 6 * k_slots, 0, 0])
    inv, pm = _plan_adaptive(
        acc, width, r_sub, k_slots, cs_next, opts.adaptive_tolerance,
        row_offset=row_offset, block_stride=opts.row_block_stride,
    )
    return acc, segments, inv, pm


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "cs", "n", "opts", "r_sub", "interpret",
        "k_slots", "g_full", "local_height", "n_global",
    ),
    donate_argnums=(4, 5),
)
def _render_adaptive_scan(
    scene, dcam, seed, chunk0, acc, segments, inv, pixel_map, width,
    height, cs, n, opts, r_sub, interpret, k_slots, g_full,
    local_height=None, row_offset=0, caux=None, n_global: int = 0,
):
    """All n uniform adaptive chunks in ONE device program: render →
    accumulate → re-decide convergence per chunk inside a lax.scan.
    Converged pixels get budget 0 and pack last, so their tiles' lanes
    die at launch — effective work tracks the unconverged pixel count
    with zero extra dispatches.

    For the STRATIFIED sampler only, the carry also accumulates
    per-pixel BETWEEN-CHUNK-MEAN statistics ([n_c, Σm, Σm²], m = this
    chunk's mean luminance — computed elementwise from consecutive
    accumulator snapshots, no kernel or permute cost): every uniform
    chunk delivers exactly ``cs`` samples to each still-sampling pixel,
    so chunk means are iid estimates of the pixel mean whose spread
    reflects the ACTUAL sampler variance — including stratification,
    which the per-sample variance cannot see (see
    :func:`_plan_adaptive`). The profile chunk (different size) is
    excluded by construction: stats start at zero here. The random
    sampler does NOT track chunk stats: its per-sample CI is already
    exact, and min-ing it with a second independent estimate of the
    same quantity would systematically select the underestimate
    (anti-conservative — the stop rule would cover below its stated
    95%)."""
    track_chunks = opts.sampler == "stratified"

    def body(carry, i):
        acc, segments, inv, pixel_map = carry[:4]
        cstats = carry[4] if track_chunks else None
        if track_chunks:
            lsum_prev, n_prev = acc[0] + acc[1] + acc[2], acc[4]
        out = _render_chunk_impl(
            scene, dcam, seed, chunk0 + i * cs, width, height, cs, opts,
            r_sub, interpret, local_height=local_height,
            row_offset=row_offset, pixel_map=pixel_map, k_slots=k_slots,
            g_full=g_full, caux=caux, n_global=n_global,
        )
        acc, segments = _accumulate_sorted(
            out, acc, segments, inv, k_slots, 6
        )
        if track_chunks:
            dn = acc[4] - n_prev  # cs where the pixel sampled, else 0
            sampled = (dn > 0.0).astype(jnp.float32)
            m_c = (
                (acc[0] + acc[1] + acc[2] - lsum_prev)
                * (1.0 / 3.0) / jnp.maximum(dn, 1.0)
            )
            cstats = cstats + jnp.stack(
                [sampled, m_c * sampled, m_c * m_c * sampled]
            )
        inv, pixel_map = _plan_adaptive(
            acc, width, r_sub, k_slots, cs, opts.adaptive_tolerance,
            chunk_stats=cstats, row_offset=row_offset,
            block_stride=opts.row_block_stride,
        )
        carry = (acc, segments, inv, pixel_map)
        if track_chunks:
            carry += (cstats,)
        return carry, None

    carry0 = (acc, segments, inv, pixel_map)
    if track_chunks:
        carry0 += (jnp.zeros((3,) + acc.shape[1:], jnp.float32),)
    carry, _ = jax.lax.scan(
        body, carry0, jnp.arange(n, dtype=jnp.int32)
    )
    return carry[0], carry[1]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "gamma", "r_sub", "k_slots"),
)
def _finalize_adaptive(acc, width: int, height: int, gamma: bool,
                       r_sub: int, k_slots: int):
    """Per-pixel mean from (rgb sums, n): adaptive renders divide by the
    pixel's OWN sample count. Returns (image, mean effective spp,
    per-pixel (H, W) sample-count map — the adaptive sample-density
    heatmap surfaced as ``stats['spp_map']``)."""
    tiles_x = pl.cdiv(width, LANES)
    hp = pl.cdiv(height, k_slots * r_sub) * k_slots * r_sub
    n = jnp.maximum(acc[4], 1.0)
    image = (
        (acc[:3] / n)
        .reshape(3, hp, tiles_x * LANES)
        .transpose(1, 2, 0)[:height, :width]
    )
    if gamma:
        image = jnp.sqrt(jnp.maximum(image, 0.0))
    n_img = acc[4].reshape(hp, tiles_x * LANES)[:height, :width]
    return image, jnp.mean(n_img), n_img


def _render_pallas(
    scene: Scene,
    dcam: DerivedCamera,
    key,
    width: int,
    height: int,
    spp: int,
    opts: TraceOptions,
    return_stats: bool,
    r_sub: int,
    interpret: bool,
    k_slots: int,
    debug=None,
    static_split=None,
    sample_offset=0,
    caux=None,
    n_global: int = 0,
    chunk_count: int | None = None,
):
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ _lowbias32(kd[1])).astype(jnp.int32)
    # base sample offset (static int or traced i32): shifts every chunk's
    # absolute sample indices — the stratified progressive step advances
    # it by spp per frame so a session walks each pixel's R2 sequence in
    # order (progressive/step.py)
    base_off = sample_offset

    # static far-root analysis (concrete scenes only): permute containable
    # spheres to the front so the scan's near-only suffix is one aligned
    # block. Pure layout — only argmin TIE-breaking among exactly
    # coincident surfaces can differ, as with any sphere reordering.
    # Debug renders skip it: the selection outline compares the winner's
    # slot index against picking's sphere id, so the layout must stay the
    # user's scene order (and interactive debug perf doesn't need it).
    # ``static_split`` = a (perm, g_full) computed by the CALLER on
    # concrete hints (progressive factories: the scene is traced here).
    if caux is not None:
        # gathered cluster scan: the scene is already the partition's
        # reordered layout and members run the full near→far fallback —
        # the containable analysis has nothing to split
        split = None
    elif static_split is not None and not opts.enable_debug:
        split = static_split
    else:
        split = None if opts.enable_debug else _containable_split(
            scene, dcam, opts
        )
    if split is not None:
        perm, g_full = split
        if perm is not None:
            scene = jax.tree_util.tree_map(lambda a: a[perm], scene)
    else:
        g_full = None

    # chunk_count: the ORIGINAL scene's slot count when the caller swapped
    # in a padded cluster layout — chunking must never depend on the
    # padded partition size (measured on device: box:cpi=1 at 500 spp
    # drifted ≤6.6e-7 with segments equal until this landed). spp
    # chunking sets the per-pixel f32 accumulation order; with
    # cluster_chunk_cost=1.0 the cluster schedule matches the flat
    # scan's exactly (bitwise parity mode). The watchdog stays safe
    # either way: the cluster kernel does
    # strictly less work per sample — cluster_chunk_cost (~0.5, device
    # A/B) folds that in so launches fill the watchdog budget instead of
    # overpaying dispatch/drain overhead. Schedules only diverge from
    # the flat scan's at multi-chunk spp; the bitwise parity gates run
    # single-launch spp (or pin cluster_chunk_cost=1.0).
    chunk = _pick_chunk_spp(
        spp, width * height,
        scene.count if chunk_count is None else chunk_count,
        opts.max_depth, opts.russian_roulette_depth,
        cost_scale=opts.cluster_chunk_cost if caux is not None else 1.0,
    )
    if opts.adaptive_tolerance > 0.0:
        import dataclasses

        if not (isinstance(base_off, int) and base_off == 0):
            # adaptive renders stop pixels at DIFFERENT sample counts, so
            # a uniform base offset cannot describe where a later render
            # would resume — the progressive step factory strips
            # adaptive_tolerance instead of passing an offset here
            raise ValueError(
                "adaptive_tolerance requires sample_offset == 0 "
                "(per-pixel stop counts cannot resume from a uniform base)"
            )

        # finer chunks than the watchdog budget needs: convergence is
        # decided between chunks, so chunk size is the per-pixel
        # overshoot floor. The measured chunk-cap matrix on the cover
        # scene (PERF.md round-3 adaptive-floor section;
        # scripts/measure_adaptive_floor.py) puts the sweet spot at a
        # ~24-spp cap (sorted chunks ≈45 spp): finer caps stop saving
        # wall (re-plan/launch overhead) and coarser ones overshoot.
        # adaptive_chunk_spp overrides (still capped by the watchdog
        # budget `chunk` — a larger value could fault the device).
        if opts.adaptive_chunk_spp > 0:
            chunk_a = min(chunk, opts.adaptive_chunk_spp)
        else:
            chunk_a = min(chunk, ADAPTIVE_AUTO_CHUNK)
        sizes_a, uniform_a = _chunk_schedule(spp, chunk_a)
        if (spp <= chunk_a or not opts.sort_pixels or not uniform_a
                or opts.enable_debug):
            # single-chunk / unsorted / irregular schedules can't gate
            # later chunks — render fixed-spp (tolerance stripped so the
            # plain 4-channel kernels serve the whole render)
            opts = dataclasses.replace(opts, adaptive_tolerance=0.0)
        else:
            acc, segments, inv, pm = _render_adaptive_profiled(
                scene, dcam, seed, width, height, sizes_a[0], opts,
                r_sub, interpret, k_slots, g_full, cs_next=sizes_a[1],
                caux=caux, n_global=n_global,
            )
            acc, segments = _render_adaptive_scan(
                scene, dcam, seed, jnp.int32(sizes_a[0]), acc, segments,
                inv, pm, width, height, sizes_a[1], len(sizes_a) - 1,
                opts, r_sub, interpret, k_slots, g_full, caux=caux,
                n_global=n_global,
            )
            image, mean_spp, spp_map = _finalize_adaptive(
                acc, width, height, opts.gamma, r_sub, k_slots
            )
            if return_stats:
                return image, {"segments": _seg_value(segments),
                               "mean_spp": mean_spp,
                               "spp_map": spp_map}
            return image
    # the profile chunk runs UNSORTED (measured 75% tile utilization vs
    # 93-95% sorted on the cover scene), so keep it short — roughly half
    # the base budget profiles plenty (the cumulative re-sort sharpens
    # every later chunk anyway) and moves ~6% of the work into sorted
    # launches. _chunk_schedule makes the sorted chunks uniform so they
    # fuse into one device program.
    sizes, uniform = _chunk_schedule(spp, chunk)
    chunk0 = sizes[0]
    if spp <= chunk or not opts.sort_pixels:
        # same chunk schedule as the sorted path so sorted and unsorted
        # renders accumulate per-pixel sums in identical order —
        # bitwise-equal images
        acc = _render_chunk(
            scene, dcam, seed, base_off, width, height, sizes[0], opts,
            r_sub, interpret, k_slots=k_slots, g_full=g_full, debug=debug,
            caux=caux, n_global=n_global,
        )
        if uniform and len(sizes) > 1:
            # whole remaining run = ONE device program
            acc = _render_chunks_scan_unsorted(
                scene, dcam, seed, jnp.int32(sizes[0]) + base_off, acc,
                width, height, sizes[1], len(sizes) - 1, opts, r_sub,
                interpret, k_slots, g_full, debug=debug, caux=caux,
                n_global=n_global,
            )
        else:
            offset = sizes[0]
            for cs in sizes[1:]:
                out = _render_chunk(
                    scene, dcam, seed, base_off + offset, width, height,
                    cs, opts, r_sub, interpret, k_slots=k_slots,
                    g_full=g_full, debug=debug, caux=caux,
                    n_global=n_global,
                )
                acc = acc + out
                offset += cs
        image, segments = _finalize(acc, width, height, spp, opts.gamma,
                                    r_sub, k_slots)
        if return_stats:
            return image, {"segments": _seg_value(segments)}
        return image

    # PROFILE-GUIDED PIXEL SORTING for multi-chunk renders: the first chunk
    # doubles as a per-pixel path-cost profile; later chunks render pixels
    # re-packed in descending measured cost, so each tile's lanes carry
    # near-equal work and the per-tile max-lane wait collapses to ≈ the
    # mean. Per-pixel math depends only on (ipx, ipy), and chunks are
    # accumulated per pixel in the same order, so the image is bitwise
    # identical to the unsorted render.
    acc, segments, inv, pixel_map = _render_chunk_profiled(
        scene, dcam, seed, width, height, chunk0, opts, r_sub, interpret,
        k_slots, g_full, debug=debug, sample_offset=base_off, caux=caux,
        n_global=n_global,
    )
    if uniform:
        # whole sorted run = ONE device program (see _render_chunks_scan)
        acc, segments = _render_chunks_scan(
            scene, dcam, seed, jnp.int32(chunk0) + base_off, acc, segments,
            inv, pixel_map, width, height, sizes[1], len(sizes) - 1, opts,
            r_sub, interpret, k_slots, g_full, debug=debug, caux=caux,
            n_global=n_global,
        )
    else:
        offset = chunk0
        for cs in sizes[1:]:
            acc, segments, inv, pixel_map = _render_chunk_sorted(
                scene, dcam, seed, base_off + offset, acc, segments, inv,
                pixel_map, width, height, cs, opts, r_sub, interpret,
                k_slots, plan_next=offset + cs < spp, g_full=g_full,
                debug=debug, caux=caux, n_global=n_global,
            )
            offset += cs
    image = _finalize_flat(acc[:3], width, height, spp, opts.gamma, r_sub,
                           k_slots)
    if return_stats:
        return image, {"segments": _seg_value(segments)}
    return image


def render_image_pallas(
    scene: Scene,
    dcam: DerivedCamera,
    width: int,
    height: int,
    spp: int,
    key,
    opts: TraceOptions,
    debug=None,
    return_stats: bool = False,
    r_sub: int = DEFAULT_R_SUB,
    k_slots: int = 4,
    static_split=None,
    sample_offset=0,
    static_cluster=None,
):
    """Pallas megakernel render.

    ``sample_offset`` (static int or traced i32) shifts every sample's
    absolute index — the stratified progressive step passes frame·spp so
    an accumulation session decomposes exactly like one offline render.

    ``opts.enable_debug`` runs the cursor-marker / selection-outline
    overlay IN the kernel (shader.frag:306-318 — two masked selects in
    the bounce body, uniforms via the SMEM table), so interactive
    debugging runs at kernel speed (VERDICT r2 #4).
    """
    if opts.enable_debug and debug is None:
        from raytracer_tpu.render.options import DebugParams

        debug = DebugParams.none()
    if not opts.enable_debug:
        debug = None  # identical trace to the non-debug kernel
    interpret = jax.default_backend() != "tpu"
    # small tiles for small images
    while r_sub > 8 and width * height < r_sub * LANES:
        r_sub //= 2
    # keep each tile's pixel block within the image height (padding lanes
    # are free, but all-padding row bands would just shrink the grid)
    while k_slots > 1 and height < k_slots * r_sub:
        k_slots //= 2
    caux, n_global = None, 0
    chunk_count = scene.count  # pre-swap: keeps cluster chunking == flat
    if static_cluster is not None:
        # progressive static-hint path: the partition was built once
        # at factory time from concrete hints (same contract as
        # static_split — the per-frame scene must match the hint's
        # GEOMETRY, or the prebuilt bounds stop being conservative);
        # the traced scene is gathered into its slot layout here
        bounds, uuid, n_global = static_cluster
        scene = _cluster_reorder(scene, uuid)
        caux = (bounds, uuid)
    elif cluster_scan_enabled(opts, scene.count):
        part = _cluster_partition(scene, opts)
        if part is not None:
            # gathered cluster scan: swap in the partition's
            # reordered scene (globals first, then grid-cell
            # clusters); the kernel gathers the winner's ORIGINAL
            # index (uuid) so picking/debug parity is preserved
            scene = part.scene
            caux = (_part_bounds(part, opts), part.uuid)
            n_global = part.n_global
    return _render_pallas(
        scene, dcam, key, width, height, spp, opts, return_stats, r_sub,
        interpret, k_slots, debug=debug, static_split=static_split,
        sample_offset=sample_offset, caux=caux, n_global=n_global,
        chunk_count=chunk_count,
    )
