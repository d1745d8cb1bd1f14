"""Does the v5e VPU run bf16 elementwise math faster than f32?

PERF.md round-3 roadmap #3 flags this as unverified. If bf16 mul/add
throughput is ~2x f32, the closest-hit scan could run its candidate
tests in bf16 (conservative epsilon) with an exact f32 re-test of the
winner; if it is 1x, the idea is dead and PERF.md should say so.

Method: a Pallas kernel holding a (8, 128) tile per dtype and running a
long chain of INDEPENDENT fma-like ops (8-way ILP so pipeline latency
does not bound throughput — see PERF.md round-1 microbenchmark), timed
over many iterations via a fori_loop. Reports native-op throughput for
f32 and bf16.
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

ITERS = 20000
CHAINS = 8   # independent streams (ILP)
OPS = 16     # mul+add pairs per stream per iteration


def make_kernel(dtype):
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

        acc = [x[c] + jnp.asarray(c, dtype) for c in range(CHAINS)]
        acc = jax.lax.fori_loop(0, ITERS, body, acc)
        out = acc[0]
        for c in range(1, CHAINS):
            out = out + acc[c]
        o_ref[...] = out

    return kernel


def run(dtype, rows):
    # same ELEMENT count per op for both dtypes: if bf16 packs 2 rows per
    # register and issues at the same rate, element throughput doubles —
    # that is the quantity a bf16 scan would see
    x = jnp.full((CHAINS, rows, 128), 1.0000001, dtype)
    fn = pl.pallas_call(
        make_kernel(dtype),
        out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
    )
    fn = jax.jit(fn)
    np.asarray(fn(x))  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    elems = ITERS * CHAINS * OPS * 2 * rows * 128
    print(f"{jnp.dtype(dtype).name} ({rows},128): {best*1e3:.2f} ms, "
          f"{elems/best/1e12:.3f} Telem-ops/s")
    return elems / best


def main():
    f32 = run(jnp.float32, 16)
    bf16 = run(jnp.bfloat16, 16)
    print(f"bf16/f32 element-throughput ratio: {bf16/f32:.2f}")


if __name__ == "__main__":
    main()
