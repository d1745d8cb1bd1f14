"""Does Mosaic lower a PER-LANE dynamic gather, and at what cost?

Round-3 roadmap #3: per-lane candidate windows (the only culling shape
compatible with the (8,128) SIMD model) die if fetching sphere params by
per-lane index costs as much as scanning. Round-2 measured the one-hot
MXU gather at ~10% of kernel time for 10 params x 488 slots; a native
per-lane gather would need to beat that by enough to pay for itself.

Probes, per (8,128) index tile over a (256,128) broadcast table:
  a) jnp.take_along_axis(tbl, idx, axis=0)   [sublane-axis gather]
  b) one-hot matmul reconstruction            [the production fallback]
Each runs ITERS times in a while_loop; report ns/gather and whether (a)
compiles at all. Results feed PERF.md round-3 roadmap.

ROUND-4 UPDATE (jax 0.9.0, 2026-08-18): Mosaic grew a lax.gather rule
(jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule) lowering to
tpu.dynamic_gather — but ONLY when table.shape == indices.shape ==
out.shape (axis 0 = sublane gather out[i,j]=t[idx[i,j],j], axis 1 =
lane gather out[i,j]=t[i,idx[i,j]]). Mode (a) above (8,128) idx over a
(256,128) table therefore STILL does not lower (shape assertion); the
same-shape forms all pass host-side cross-lowering (jax.export
platforms=['tpu'] — verified without the tunnel: (8,128)ax0, (8,128)ax1,
(32,128)ax0, (8,512)ax1, (256,128)ax0, (16,256)ax1). run_sameshape()
times the usable forms on device; the per-lane window design consumes
the LANE-axis form via a 128-entry-per-table bank-select (see
render/pallas_kernel.py windowed scan).
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

S = 256
ITERS = 5000


def run(mode: str):
    def kernel(tbl_ref, o_ref):
        tbl = tbl_ref[...]  # (S, 128) f32

        def body(state):
            i, acc = state
            # per-lane indices that vary per iteration (prevent hoisting)
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                + i.astype(jnp.int32)
            ) % S
            if mode == "take_along_axis":
                g = jnp.take_along_axis(tbl, idx, axis=0)
            else:  # one-hot matmul: (8,128) idx -> per-sublane-row gather
                # production form: one (S,128) one-hot per ray row,
                # (1,S)@(S,128) matmul per row
                rows = []
                for r in range(8):
                    oh = (
                        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
                        == idx[r : r + 1]
                    ).astype(jnp.float32)
                    rows.append(
                        jax.lax.dot_general(
                            tbl[:, 0:1].T, oh,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                g = jnp.concatenate(rows, axis=0)
            return i + 1.0, acc + g

        init = (jnp.float32(0.0), jnp.zeros((8, 128), jnp.float32))

        def cond(state):
            return state[0] < ITERS

        final = jax.lax.while_loop(cond, body, init)
        o_ref[...] = final[1]

    tbl = jnp.asarray(
        np.random.RandomState(0).uniform(size=(S, 128)).astype(np.float32)
    )
    fn = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))
    try:
        t0 = time.perf_counter()
        np.asarray(fn(tbl))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{mode}: DOES NOT LOWER — {type(e).__name__}: {str(e)[:200]}")
        return
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(tbl))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{mode}: {best*1e3:.2f} ms total, {best/ITERS*1e9:.1f} ns per "
          f"(8,128)-gather (compile {compile_s:.0f}s)")


def run_sameshape(shape, axis):
    """Time the SAME-SHAPE dynamic_gather forms that do lower (jax 0.9.0):
    table.shape == idx.shape == out.shape, axis 0 (sublane) or 1 (lane)."""
    smax = shape[axis]

    def kernel(tbl_ref, o_ref):
        tbl = tbl_ref[...]

        def body(state):
            i, acc = state
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, shape, 1 - axis)
                + i.astype(jnp.int32)
            ) % smax
            g = jnp.take_along_axis(tbl, idx, axis=axis)
            return i + 1.0, acc + g

        init = (jnp.float32(0.0), jnp.zeros(shape, jnp.float32))
        final = jax.lax.while_loop(lambda s: s[0] < ITERS, body, init)
        o_ref[...] = final[1]

    tbl = jnp.asarray(
        np.random.RandomState(0).uniform(size=shape).astype(np.float32)
    )
    fn = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    ))
    name = f"dynamic_gather{shape} axis={axis}"
    try:
        t0 = time.perf_counter()
        np.asarray(fn(tbl))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name}: DOES NOT COMPILE — {type(e).__name__}: {str(e)[:200]}")
        return
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(tbl))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1e3:.2f} ms total, {best/ITERS*1e9:.1f} ns per "
          f"gather (compile {compile_s:.0f}s)")


def main():
    run("take_along_axis")
    run("onehot_matmul")
    # the forms that actually lower on jax 0.9.0 — lane-axis (8,128) is
    # the per-lane-window enabling primitive; (8,512) checks whether the
    # device compiler accepts multi-vreg lane gathers and their cost
    run_sameshape((8, 128), 1)
    run_sameshape((8, 128), 0)
    run_sameshape((8, 512), 1)
    run_sameshape((32, 128), 0)


if __name__ == "__main__":
    main()
