"""Render layer: the path-tracing kernels.

Two interchangeable implementations behind one signature
(``trace → (H, W, 3) linear color``):

- :mod:`raytracer_tpu.render.tracer` — the reference implementation in plain
  batched jnp (runs anywhere, including the CPU test backend),
- :mod:`raytracer_tpu.render.pallas_kernel` — the Pallas TPU megakernel, the
  performance path.

Both rebuild static/shader.frag:106-383 (camera ray-gen → hit_world →
scatter → sky, with spp averaging and gamma) in wavefront style: the
per-thread early returns of the GLSL kernel (shader.frag:310/316/328/334)
become masked lane updates, which is the divergence-free TPU formulation.
"""

from raytracer_tpu.render.api import render_image, TraceOptions

__all__ = ["render_image", "TraceOptions"]
