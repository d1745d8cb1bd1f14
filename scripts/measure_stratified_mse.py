"""Stratified-vs-random MSE on the CPU jnp path (PERF.md table source).

Methodology (same as the round-3 landing measurement): 120x80 crop of a
preset scene, MSE against a 2048-spp random-sampler reference of the
same scene, mean over 4 seeds, gamma ON (matches what a user sees).
Run on CPU (forced below) -- this is a sampler-quality measurement, not
a wall-clock one.

    python scripts/measure_stratified_mse.py            # demo + dof
    MSE_SCENES=demo MSE_SPPS=8,32 python scripts/measure_stratified_mse.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from raytracer_tpu.camera.camera import derive_camera
from raytracer_tpu.render.tracer import render_image_jnp
from raytracer_tpu.render.options import TraceOptions
from raytracer_tpu.scene import presets

W, H = 120, 80
REF_SPP = 2048
SEEDS = 4


def main():
    scenes = _os.environ.get("MSE_SCENES", "demo,dof").split(",")
    spps = [int(s) for s in _os.environ.get("MSE_SPPS", "8,32,128").split(",")]
    for name in scenes:
        scene, cam, *_ = presets.get_config(name, W, H)
        dcam = derive_camera(cam)
        opts = TraceOptions(max_depth=8)
        ref = np.asarray(
            render_image_jnp(
                scene, dcam, W, H, REF_SPP, jax.random.PRNGKey(999), opts
            )
        )
        for spp in spps:
            mses = {}
            for sampler in ("random", "stratified"):
                o = dataclasses.replace(opts, sampler=sampler)
                errs = [
                    float(
                        ((np.asarray(render_image_jnp(
                            scene, dcam, W, H, spp,
                            jax.random.PRNGKey(k), o,
                        )) - ref) ** 2).mean()
                    )
                    for k in range(SEEDS)
                ]
                mses[sampler] = float(np.mean(errs))
            print(
                f"{name:6s} spp={spp:4d}  random={mses['random']:.3e}  "
                f"stratified={mses['stratified']:.3e}  "
                f"reduction={mses['random'] / mses['stratified']:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
