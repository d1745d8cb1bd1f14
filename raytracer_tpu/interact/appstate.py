"""AppState: the host-side application state — the reference's ``State``
struct (src/state.rs:31-94) minus everything that became a device pytree.

The reference kept one global ``Arc<Mutex<State>>`` mixing camera math,
render flags, input state and analytics; here the split is explicit:

- device state: RenderState (accumulation) + Scene + CameraConfig pytrees,
- host state: this class — render flags, input, debounce clocks, fps window.

``update_pipeline``'s change-detection-by-struct-equality
(src/state.rs:319-347: re-derive, compare, reset accumulation on change)
becomes :func:`cameras_equal` — the engine compares the camera pytree
before/after an edit and resets accumulation if anything moved.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from raytracer_tpu.camera.camera import CameraConfig
from raytracer_tpu.camera.controller import KeydownMap
from raytracer_tpu.scene.spheres import NO_SELECTED_OBJECT_ID

# src/dom.rs:13
MAX_CANVAS_SIZE = 1280
# src/lib.rs:85-90
RESIZE_DEBOUNCE_MS = 500.0
# src/webgl.rs:342-347 — spp floor while paused, "for a quality still"
PAUSED_SPP_FLOOR = 25


def cameras_equal(a: CameraConfig, b: CameraConfig) -> bool:
    """Pytree equality — the analog of `self != &prev_state`
    (src/state.rs:343)."""
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def adjusted_screen_dimensions(
    raw_width: float, raw_height: float, max_size: int = MAX_CANVAS_SIZE
):
    """Cap the longest edge at max_size preserving aspect
    (src/dom.rs:277-291)."""
    aspect = raw_width / raw_height
    if raw_width > raw_height:
        w = min(raw_width, float(max_size))
        return int(w), int(w / aspect)
    h = min(raw_width, float(max_size))  # quirk preserved: reference caps by
    # raw_width in the portrait branch too (src/dom.rs:286)
    return int(h * aspect), int(h)


@dataclasses.dataclass
class AppState:
    """Host render flags + input + analytics (src/state.rs:58-94)."""

    width: int
    height: int
    samples_per_pixel: int = 1
    max_depth: int = 8

    # render flags (src/state.rs:58-80)
    is_paused: bool = True
    should_average: bool = True
    should_render: bool = True
    should_save: bool = False
    render_count: int = 0
    last_frame_weight: float = 1.0
    max_render_count: int = 100_000
    prev_now: float = 0.0
    should_update_to_match_window_size: bool = False
    last_resize_time: float = 0.0

    # movement (src/state.rs:83-84)
    keydown_map: KeydownMap = dataclasses.field(default_factory=KeydownMap)
    look_sensitivity: float = 0.1

    # debugging (src/state.rs:87-89)
    enable_debugging: bool = False
    cursor_point: tuple = (0.0, 0.0, 0.0)
    selected_object: int = NO_SELECTED_OBJECT_ID

    # analytics (src/state.rs:92-93)
    prev_fps_update_time: float = 0.0
    prev_fps: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.prev_fps is None:
            self.prev_fps = np.zeros(50)  # 50-sample window (src/state.rs:93)

    # --- frame-loop predicates -------------------------------------------

    def effective_spp(self) -> int:
        """spp floors at 25 while paused (src/webgl.rs:342-347) so stills and
        post-resize frames are high quality."""
        return max(self.samples_per_pixel, PAUSED_SPP_FLOOR) if self.is_paused else self.samples_per_pixel

    def compute_should_render(self) -> bool:
        """The should-render gate (src/lib.rs:77-82): render when unpaused,
        or when saving, or for the very first frame."""
        return (
            (self.should_render and not self.is_paused)
            or (self.should_render and self.is_paused and self.should_save)
            or (
                self.should_render
                and self.is_paused
                and not self.should_save
                and self.render_count == 0
            )
        )

    def update_render_globals(self) -> None:
        """src/state.rs:443-450: one-shot rendering unless averaging;
        clamped frame count."""
        if not self.should_average:
            self.should_render = False
        self.render_count = min(self.render_count + 1, self.max_render_count)

    # --- resize (src/lib.rs:85-90 + src/state.rs:364-398) ----------------

    def request_resize(self, now_ms: float) -> None:
        self.should_update_to_match_window_size = True
        self.last_resize_time = now_ms

    def resize_due(self, now_ms: float) -> bool:
        return (
            self.should_update_to_match_window_size
            and now_ms - self.last_resize_time > RESIZE_DEBOUNCE_MS
        )

    def apply_resize(self, raw_width: float, raw_height: float, now_ms: float):
        """Returns the new (width, height); the engine re-jits at the new
        static shape (the analog of reallocating both textures,
        src/state.rs:379-397)."""
        self.should_update_to_match_window_size = False
        self.last_resize_time = now_ms
        self.width, self.height = adjusted_screen_dimensions(raw_width, raw_height)
        return self.width, self.height

    # --- analytics (src/state.rs:400-409, src/dom.rs:145-158) -------------

    def update_moving_fps(self, now_ms: float, dt_ms: float) -> None:
        self.prev_now = now_ms
        if dt_ms > 0:
            self.prev_fps[:-1] = self.prev_fps[1:]
            self.prev_fps[-1] = 1000.0 / dt_ms

    def average_fps(self, now_ms: float, throttle_ms: float = 250.0):
        """Returns the 50-frame average fps, throttled to 250 ms updates
        (src/dom.rs:155); None between updates."""
        if now_ms - self.prev_fps_update_time > throttle_ms:
            self.prev_fps_update_time = now_ms
            return float(self.prev_fps.mean())
        return None
