"""Isolated closest-hit-scan layout shootout.

The production kernel computes the scan chain over full (S_pad, 128)
arrays; Mosaic tiles each op into (8,128) granules with VMEM traffic
between ops when the array exceeds the register file. The strip-slope
probe (probe_strip_slope.py) measured ~64-100 cycles per strip-iteration
for ~192 native ops (8 rows x ~24 ops) — ~1.8-3 ops/cycle vs the VPU's
~4/cycle peak. This benchmark isolates the scan chain and compares:

  full   — one chain over (S, 128) per row (production layout)
  s8     — python loop over (64, 128) superstrips
  s4     — python loop over (32, 128) superstrips
  s1     — python loop over (8, 128) strips (pure register form)

All variants compute identical math (near-only chain + running min);
the winner's ns/strip-iteration decides whether the production kernel
gets restructured.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from raytracer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

S = 512          # sphere slots (64 strips)
R_SUB = 8        # ray rows
ITERS = 20000    # while-loop trips per launch
MIN_T = 0.001


def make_kernel(block: int):
    """block = sphere slots per inner op (512 = production full-array)."""

    n_blocks = S // block

    def kernel(sph_ref, o_ref):
        # rays: 8 rows x 128 lanes, varied per iteration so nothing hoists
        ox = jax.lax.broadcasted_iota(
            jnp.int32, (R_SUB, 128), 1).astype(jnp.float32) * 0.01
        oy = jnp.full((R_SUB, 128), 1.0)
        oz = jax.lax.broadcasted_iota(
            jnp.int32, (R_SUB, 128), 0).astype(jnp.float32) * 0.1
        dx = ox * 0.1 + 0.3
        dy = oy * -0.05
        dz = oz * 0.07 + 0.1

        def body(state):
            i, ox, oy, oz, acc = state
            a = dx * dx + dy * dy + dz * dz
            o_dot_d = ox * dx + oy * dy + oz * dz
            o_dot_o = ox * ox + oy * oy + oz * oz
            min_t_a = MIN_T * a

            best = []
            for row in range(R_SUB):
                dxr = dx[row : row + 1]
                dyr = dy[row : row + 1]
                dzr = dz[row : row + 1]
                oxr = ox[row : row + 1]
                oyr = oy[row : row + 1]
                ozr = oz[row : row + 1]
                odd_r = o_dot_d[row : row + 1]
                ooo_r = o_dot_o[row : row + 1]
                min_q = min_t_a[row : row + 1]
                m = None
                for b in range(n_blocks):
                    lo = b * block
                    s_cx = sph_ref[lo : lo + block, 0:1]
                    s_cy = sph_ref[lo : lo + block, 1:2]
                    s_cz = sph_ref[lo : lo + block, 2:3]
                    s_k1 = sph_ref[lo : lo + block, 3:4]
                    c_dot_d = s_cx * dxr + s_cy * dyr + s_cz * dzr
                    c_dot_o = s_cx * oxr + s_cy * oyr + s_cz * ozr
                    nb = c_dot_d - odd_r
                    c_coef = ooo_r - 2.0 * c_dot_o + s_k1
                    disc = nb * nb - a[row : row + 1] * c_coef
                    sq = jnp.where(
                        disc >= 0.0, jnp.sqrt(jnp.abs(disc)),
                        jnp.float32(-3e38),
                    )
                    q_near = nb - sq
                    cand = jnp.where(
                        q_near >= min_q, q_near, jnp.float32(3e38)
                    )
                    # elementwise partial min (1 op/block); ONE sublane
                    # reduce per row at the end
                    m = cand if m is None else jnp.minimum(m, cand)
                best.append(jnp.min(m, axis=0, keepdims=True))
            bq = jnp.concatenate(best, axis=0)
            # fold the winner back into the origin so every iteration
            # depends on the last (no cross-iteration CSE)
            ox = ox + bq * 1e-12
            oy = oy + bq * 1e-12
            oz = oz - bq * 1e-12
            return i + 1.0, ox, oy, oz, acc + bq

        def cond(state):
            return state[0] < ITERS

        init = (jnp.float32(0.0), ox, oy, oz,
                jnp.zeros((R_SUB, 128), jnp.float32))
        final = jax.lax.while_loop(cond, body, init)
        o_ref[...] = final[4]

    return kernel


def run(block: int, label: str):
    sph = np.random.RandomState(0).uniform(-5, 5, (S, 4)).astype(np.float32)
    sph[:, 3] = np.abs(sph[:, 3])  # k1-ish
    fn = pl.pallas_call(
        make_kernel(block),
        out_shape=jax.ShapeDtypeStruct((R_SUB, 128), jnp.float32),
    )
    fn = jax.jit(fn)
    x = jnp.asarray(sph)
    t0 = time.perf_counter()
    np.asarray(fn(x))  # warm (compile)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    strips = S // 8
    per_strip_iter = best / (ITERS * strips)
    print(f"{label:5s} block={block:3d}: {best*1e3:7.2f} ms "
          f"({per_strip_iter*1e9:6.1f} ns/strip-iter, "
          f"compile {compile_s:.0f}s)")
    return per_strip_iter


def main():
    r = {}
    r["full"] = run(S, "full")
    r["s8"] = run(64, "s8")
    r["s4"] = run(32, "s4")
    r["s1"] = run(8, "s1")
    base = r["full"]
    for k, v in r.items():
        print(f"{k}: {base/v:.2f}x vs full")


if __name__ == "__main__":
    main()
