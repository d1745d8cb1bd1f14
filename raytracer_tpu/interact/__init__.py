"""Interaction layer: picking, autofocus, selection, and the host app state.

Rebuilds the reference's CPU-side interaction path — ``get_center_hit``
(src/glsl.rs:213-239) and ``update_cursor_position_in_world``
(src/state.rs:453-471) — by reusing the *same* device hit kernel the
renderer uses, killing the reference's hand-maintained Rust mirror of the
GLSL code (src/glsl.rs:1-2).
"""

from raytracer_tpu.interact.picking import CenterHit, center_hit, update_cursor_state
from raytracer_tpu.interact.appstate import AppState

__all__ = ["CenterHit", "center_hit", "update_cursor_state", "AppState"]
