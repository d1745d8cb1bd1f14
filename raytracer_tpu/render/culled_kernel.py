"""Statically-unrolled cluster-culled kernel ("culled" variant).

Second-generation culling design, built on the measured failures of the
first (see PERF.md): the per-cluster ``lax.cond`` with an 11-array carry
cost more than the culled work saved, and Mosaic cannot lower selects on
(1,128) values. This version:

- keeps the flat kernel's tile-level structure (all per-ray math at
  (r_sub,128) width, rectangular pixel tiles),
- unrolls the cluster loop STATICALLY and gates each cluster's exact-
  intersection block with ``@pl.when`` mutating VMEM scratch accumulators —
  zero loop-carried values cross the branch,
- updates running best-hit state with arithmetic blends
  (old + (new-old)·mask) — no select_n on (1,128) shapes anywhere,
- tracks the winning sphere INDEX (not its parameters) through the blocks,
  and gathers parameters once per row afterwards with the same one-hot MXU
  matmul the flat kernel uses.

Scene preparation (Morton-ordered clusters + bounding spheres) comes from
raytracer_tpu.scene.accel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.camera.camera import DerivedCamera
from raytracer_tpu.render.options import MAX_T, MIN_T, TraceOptions
from raytracer_tpu.render.pallas_kernel import (
    LANES,
    TWO_PI,
    _camera_uniforms,
    _lowbias32,
    _normalize3,
    _dot3,
    _sphere_table,
    _params_table_t,
    _u01,
    _unit_sphere,
    _unit_vec,
)

CULL_GROUP = 32  # spheres per cluster (static-unroll code size ∝ K = S/G)


def _make_kernel_culled(
    s_pad: int,
    k_clusters: int,
    group: int,
    spp: int,
    max_depth: int,
    r_sub: int,
    width: int,
    height: int,
    opts: TraceOptions,
    tiles_x: int,
):
    inv_w = 1.0 / width
    inv_h = 1.0 / height
    draws_per_bounce = 8
    draws_per_sample = 4 + max_depth * draws_per_bounce
    dn = (((1,), (0,)), ((), ()))

    def kernel(uni_ref, seed_ref, sph_ref, prm_ref, clu_ref, out_ref,
               gat_ref, best_ref, bj_ref):
        # clu_ref: (K_pad, 8): cx, cy, cz, |c|^2-rad^2
        # best_ref/bj_ref: (r_sub, LANES) scratch — running best q / index
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

        k_cx = clu_ref[:, 0:1]
        k_cy = clu_ref[:, 1:2]
        k_cz = clu_ref[:, 2:3]
        k_k1 = clu_ref[:, 3:4]

        s_iota = jax.lax.broadcasted_iota(
            jnp.int32, (s_pad, LANES), 0
        ).astype(jnp.float32)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (r_sub, LANES), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r_sub, LANES), 1)
        ipx = (t % tiles_x) * LANES + lane_ids
        ipy = (t // tiles_x) * r_sub + row_ids
        gid = ipy * (tiles_x * LANES) + ipx
        pix = _lowbias32(gid.astype(jnp.uint32) ^ jnp.uint32(base_seed))
        px = ipx.astype(jnp.float32)
        py = ipy.astype(jnp.float32)
        # padding lanes (the 2-D tile grid rounds W/H up): never alive, so
        # they cost nothing, count nothing, and their output is cropped
        in_image = ((ipx < width) & (ipy < height)).astype(jnp.float32)

        zero = jnp.zeros((r_sub, LANES), jnp.float32)

        def sample_body(s, carry):
            acc_r, acc_g, acc_b, segs = carry
            ctr0 = (sample_offset + s) * draws_per_sample

            st_s = (px + 0.5 + _u01(pix, ctr0, 0)) * inv_w
            st_t = (py + 0.5 + _u01(pix, ctr0, 1)) * inv_h
            ang = _u01(pix, ctr0, 2) * TWO_PI
            rad = lens_radius * jnp.sqrt(_u01(pix, ctr0, 3))
            rdx = rad * jnp.cos(ang)
            rdy = rad * jnp.sin(ang)
            ox = ox0 + (ux * rdx + vvx * rdy)
            oy = oy0 + (uy * rdx + vvy * rdy)
            oz = oz0 + (uz * rdx + vvz * rdy)
            dx = llx + st_s * hx + st_t * vx - ox
            dy = lly + st_s * hy + st_t * vy - oy
            dz = llz + st_s * hz + st_t * vz - oz

            cr = jnp.ones((r_sub, LANES), jnp.float32)
            cg = jnp.ones((r_sub, LANES), jnp.float32)
            cb = jnp.ones((r_sub, LANES), jnp.float32)
            rr, rg, rb = zero, zero, zero
            alive = in_image

            def bounce_cond(state):
                i = state[0]
                alive = state[13]
                return jnp.logical_and(i < max_depth, jnp.max(alive) > 0.0)

            def bounce_body(state):
                (i, ox, oy, oz, dx, dy, dz, cr, cg, cb, rr, rg, rb,
                 alive, segs) = state
                ctr = ctr0 + 4 + i * draws_per_bounce
                segs = segs + jnp.sum(alive)
                alive_b = alive > 0.0

                a = _dot3(dx, dy, dz, dx, dy, dz)
                inv_a = 1.0 / a
                o_dot_d = _dot3(ox, oy, oz, dx, dy, dz)
                o_dot_o = _dot3(ox, oy, oz, ox, oy, oz)
                min_t_a = MIN_T * a
                max_t_a = MAX_T * a

                # --- cluster-bound sweep: does any live ray in the tile
                # intersect cluster c's bounding sphere? (K_pad, LANES) ---
                kmask = None
                for row in range(r_sub):
                    dxr = dx[row : row + 1]
                    dyr = dy[row : row + 1]
                    dzr = dz[row : row + 1]
                    oxr = ox[row : row + 1]
                    oyr = oy[row : row + 1]
                    ozr = oz[row : row + 1]
                    cdd = k_cx * dxr + k_cy * dyr + k_cz * dzr
                    cdo = k_cx * oxr + k_cy * oyr + k_cz * ozr
                    half_b = o_dot_d[row : row + 1] - cdd
                    c_coef = o_dot_o[row : row + 1] - 2.0 * cdo + k_k1
                    disc = half_b * half_b - a[row : row + 1] * c_coef
                    sq = jnp.where(
                        disc >= 0.0, jnp.sqrt(jnp.abs(disc)),
                        jnp.float32(-3e38),
                    )
                    # far root >= MIN_T, div-free: sq >= half_b + min_q
                    chit = (
                        (sq >= half_b + min_t_a[row : row + 1])
                        & (alive_b[row : row + 1])
                    ).astype(jnp.float32)
                    kmask = chit if kmask is None else kmask + chit

                # --- exact blocks, statically unrolled, pl.when-gated ---
                best_ref[:, :] = jnp.full((r_sub, LANES), 3e38, jnp.float32)
                bj_ref[:, :] = jnp.full((r_sub, LANES), -1.0, jnp.float32)

                for c in range(k_clusters):
                    pred = jnp.sum(kmask[c : c + 1, :]) > 0.0

                    @pl.when(pred)
                    def _(c=c):
                        blk = sph_ref[c * group : (c + 1) * group, :]
                        bcx = blk[:, 0:1]
                        bcy = blk[:, 1:2]
                        bcz = blk[:, 2:3]
                        bk1 = blk[:, 3:4]
                        jbase = jnp.float32(c * group)
                        g_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (group, LANES), 0
                        ).astype(jnp.float32) + jbase
                        for row in range(r_sub):
                            dxr = dx[row : row + 1]
                            dyr = dy[row : row + 1]
                            dzr = dz[row : row + 1]
                            oxr = ox[row : row + 1]
                            oyr = oy[row : row + 1]
                            ozr = oz[row : row + 1]
                            cdd = bcx * dxr + bcy * dyr + bcz * dzr
                            cdo = bcx * oxr + bcy * oyr + bcz * ozr
                            half_b = o_dot_d[row : row + 1] - cdd
                            c_coef = (
                                o_dot_o[row : row + 1] - 2.0 * cdo + bk1
                            )
                            disc = half_b * half_b - a[row : row + 1] * c_coef
                            sq = jnp.where(
                                disc >= 0.0, jnp.sqrt(jnp.abs(disc)),
                                jnp.float32(-3e38),
                            )
                            q_near = -half_b - sq
                            q_far = -half_b + sq
                            min_q = min_t_a[row : row + 1]
                            max_q = max_t_a[row : row + 1]
                            q = jnp.where(q_near >= min_q, q_near, q_far)
                            valid = (q >= min_q) & (q <= max_q)
                            cand = jnp.where(valid, q, jnp.float32(3e38))
                            bq = jnp.min(cand, axis=0, keepdims=True)
                            bj_loc = jnp.min(
                                jnp.where(cand == bq, g_iota,
                                          jnp.float32(1e9)),
                                axis=0,
                                keepdims=True,
                            )
                            # combine into scratch WITHOUT select_n on
                            # (1,LANES) shapes (Mosaic can't relayout them):
                            # the q combine is an exact minimum; the index
                            # combine is an arithmetic blend, exact because
                            # indices are small integers (a blend on q would
                            # catastrophically cancel against the 3e38
                            # sentinel: old + (bq-old) rounds to 0)
                            old_q = best_ref[row : row + 1, :]
                            old_j = bj_ref[row : row + 1, :]
                            imp = jnp.maximum(jnp.sign(old_q - bq), 0.0)
                            best_ref[row : row + 1, :] = jnp.minimum(
                                old_q, bq
                            )
                            bj_ref[row : row + 1, :] = (
                                old_j + (bj_loc - old_j) * imp
                            )

                best_q = best_ref[:, :]
                bj = bj_ref[:, :]
                hit = best_q < jnp.float32(1e20)
                best_t = jnp.where(hit, best_q * inv_a, MAX_T)

                # --- per-row one-hot gather via MXU (same as flat kernel) ---
                for row in range(r_sub):
                    oh = (s_iota == bj[row : row + 1, :]).astype(jnp.float32)
                    gat_ref[:, row, :] = jax.lax.dot_general(
                        prm_ref[:, :], oh, dn,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
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

                hpx = ox + best_t * dx
                hpy = oy + best_t * dy
                hpz = oz + best_t * dz
                nx = (hpx - scx) * inv_r
                ny = (hpy - scy) * inv_r
                nz = (hpz - scz) * inv_r
                front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

                uvx, uvy, uvz = _unit_vec(pix, ctr, 0)
                usx, usy, usz = _unit_sphere(pix, ctr, 3)
                glass_u = _u01(pix, ctr, 6)

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

                d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
                mdx = dx - 2.0 * d_dot_n * nx + fuzz * usx
                mdy = dy - 2.0 * d_dot_n * ny + fuzz * usy
                mdz = dz - 2.0 * d_dot_n * nz + fuzz * usz
                metal_ok = _dot3(nx, ny, nz, mdx, mdy, mdz) > 0.0

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
                rpx = ratio * (udx + cos_t * nx)
                rpy = ratio * (udy + cos_t * ny)
                rpz = ratio * (udz + cos_t * nz)
                kk = jnp.maximum(
                    0.0, 1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)
                )
                sk = jnp.sqrt(kk)
                refx = rpx - sk * nx
                refy = rpy - sk * ny
                refz = rpz - sk * nz
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
                did_scatter = is_diffuse | (is_metal & metal_ok) | is_glass

                miss = jnp.logical_and(alive_b, jnp.logical_not(hit))
                sky_t = 0.5 * (udy + 1.0)
                sky_r = 1.0 - 0.5 * sky_t
                sky_g = 1.0 - 0.3 * sky_t
                rr = jnp.where(miss, cr * sky_r, rr)
                rg = jnp.where(miss, cg * sky_g, rg)
                rb = jnp.where(miss, cb * jnp.ones_like(sky_t), rb)

                scat = alive_b & hit & did_scatter
                cr = jnp.where(scat, cr * al_r, cr)
                cg = jnp.where(scat, cg * al_g, cg)
                cb = jnp.where(scat, cb * al_b, cb)
                ox = jnp.where(scat, hpx, ox)
                oy = jnp.where(scat, hpy, oy)
                oz = jnp.where(scat, hpz, oz)
                dx = jnp.where(scat, ndx, dx)
                dy = jnp.where(scat, ndy, dy)
                dz = jnp.where(scat, ndz, dz)
                return (i + 1, ox, oy, oz, dx, dy, dz, cr, cg, cb,
                        rr, rg, rb, scat.astype(jnp.float32), segs)

            (_, _, _, _, _, _, _, cr, cg, cb, rr, rg, rb, alive,
             segs) = jax.lax.while_loop(
                bounce_cond,
                bounce_body,
                (jnp.int32(0), ox, oy, oz, dx, dy, dz, cr, cg, cb,
                 rr, rg, rb, alive, segs),
            )
            if not opts.exhaust_black:
                alive_b = alive > 0.0
                rr = jnp.where(alive_b, cr, rr)
                rg = jnp.where(alive_b, cg, rg)
                rb = jnp.where(alive_b, cb, rb)
            return acc_r + rr, acc_g + rg, acc_b + rb, segs

        acc_r, acc_g, acc_b, segs = jax.lax.fori_loop(
            0, spp, sample_body, (zero, zero, zero, jnp.float32(0.0))
        )
        out_ref[0, 0] = acc_r
        out_ref[0, 1] = acc_g
        out_ref[0, 2] = acc_b
        out_ref[0, 3] = jnp.full((r_sub, LANES), segs)

    return kernel


def _cluster_table_culled(bounds: jnp.ndarray) -> jnp.ndarray:
    """(K_pad, 8): cx, cy, cz, |c|^2-rad^2. Padding rows never enter the
    static cluster loop."""
    cx, cy, cz, rad = bounds[:, 0], bounds[:, 1], bounds[:, 2], bounds[:, 3]
    k1 = cx * cx + cy * cy + cz * cz - rad * rad
    table = jnp.stack([cx, cy, cz, k1], axis=-1)
    table = jnp.pad(table, ((0, 0), (0, 4)))
    k = bounds.shape[0]
    k_pad = max(8, -(-k // 8) * 8)
    if k_pad != k:
        table = jnp.pad(table, ((0, k_pad - k), (0, 0)))
    return table


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "chunk_spp", "opts", "r_sub", "interpret", "group",
    ),
)
def render_chunk_culled(
    cscene,  # ClusteredScene
    dcam: DerivedCamera,
    seed,
    sample_offset,
    width: int,
    height: int,
    chunk_spp: int,
    opts: TraceOptions,
    r_sub: int,
    interpret: bool,
    group: int,
):
    scene = cscene.scene
    tiles_x = pl.cdiv(width, LANES)
    tiles_y = pl.cdiv(height, r_sub)
    nt = tiles_x * tiles_y
    k_clusters = cscene.bounds.shape[0]
    kernel = _make_kernel_culled(
        scene.count, k_clusters, group, chunk_spp, opts.max_depth, r_sub,
        width, height, opts, tiles_x,
    )
    seeds = jnp.stack([seed, jnp.asarray(sample_offset, jnp.int32)])
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sphere table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params^T
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster bounds
        ],
        out_specs=pl.BlockSpec((1, 4, r_sub, LANES), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, 4, r_sub, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, r_sub, LANES), jnp.float32),  # gather
            pltpu.VMEM((r_sub, LANES), jnp.float32),  # best q
            pltpu.VMEM((r_sub, LANES), jnp.float32),  # best index
        ],
        interpret=interpret,
    )(
        _camera_uniforms(dcam),
        seeds,
        _sphere_table(scene),
        _params_table_t(scene),
        _cluster_table_culled(cscene.bounds),
    )
