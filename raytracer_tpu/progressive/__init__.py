"""Progressive rendering: on-device accumulation + jitted step.

Replaces the reference's ping-pong texture pair and its double render per
frame (src/webgl.rs:180-205 traces the scene twice: once to screen, once to
the accumulation FBO) with a single on-device accumulation buffer updated in
place via buffer donation — one trace per frame, no host round-trips.
"""

from raytracer_tpu.progressive.state import RenderState, init_render_state
from raytracer_tpu.progressive.step import accumulate, make_step_fn

__all__ = ["RenderState", "init_render_state", "accumulate", "make_step_fn"]
