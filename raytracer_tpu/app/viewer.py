"""Interactive terminal viewer: the reference's browser UX without a browser.

Maps the reference's controls (src/dom.rs:160-273) onto a raw-mode
terminal, rendering the progressive accumulation buffer as ANSI truecolor
half-block characters (two pixels per character cell):

    w/a/s/d     fly (src/state.rs:411-441)         i/j/k/l   look (mouse-look analog)
    e/c         up/down (space/shift analog)       +/-       fov zoom (wheel analog)
    p           pause/resume (Escape analog)       x         save PNG ("Save Image")
    r           reset scene ("Reset")              g         toggle debug overlay
    q           quit

The frame loop is exactly the Engine tick (trace 1 spp → accumulate →
display), i.e. the rAF loop of src/lib.rs:61-107 driven by a terminal clock.
"""

from __future__ import annotations

import select
import sys
import time

import numpy as np

from raytracer_tpu.app.engine import Engine
from raytracer_tpu.scene import presets


def frame_to_ansi(img: np.ndarray, max_cols: int = 100) -> str:
    """f32 (H, W, 3) GL-row-order framebuffer → ANSI half-block string.

    Each character cell shows two vertically stacked pixels (▀ with fg =
    upper pixel, bg = lower pixel). Downsamples by striding to fit
    ``max_cols``. Encoded by the native C++ runtime when available (this
    is the per-frame host hot path — the analog of the reference's canvas
    blit); the pure-Python fallback below is byte-identical (pinned by
    tests/test_viewer.py).
    """
    h, w, _ = img.shape
    stride = max(1, (w + max_cols - 1) // max_cols)
    from raytracer_tpu.native import ansi_halfblocks_native

    native = ansi_halfblocks_native(img, stride)
    if native is not None:
        return native
    sub = img[::-1][::stride, ::stride]  # flip to scanline order + downsample
    if sub.shape[0] % 2:
        sub = sub[:-1]
    u8 = np.clip(sub * 255.0 + 0.5, 0, 255).astype(np.uint8)
    top = u8[0::2]
    bot = u8[1::2]
    lines = []
    for tr, br in zip(top, bot):
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(tr, br)
        ]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


class _RawTerminal:
    """Raw-mode stdin for non-blocking single-key reads.

    Degrades to a keyless no-op when stdin is not a tty (piped/CI
    ``--max-frames`` runs) instead of dying on the termios ioctl."""

    def __enter__(self):
        self.enabled = sys.stdin.isatty()
        if self.enabled:
            import termios
            import tty

            self.fd = sys.stdin.fileno()
            self.saved = termios.tcgetattr(self.fd)
            tty.setcbreak(self.fd)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import termios

            termios.tcsetattr(self.fd, termios.TCSADRAIN, self.saved)

    def read_keys(self):
        if not self.enabled:
            return []
        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            keys.append(sys.stdin.read(1))
        return keys


#: key → engine action (held-key semantics approximated by a decay window)
MOVE_KEYS = {"w": "w", "a": "a", "s": "s", "d": "d", "e": "space", "c": "shift"}
LOOK_STEP = 15.0  # "mouse" movement units per keypress


def run_viewer(
    config: str = "demo",
    width: int = 320,
    height: int = 180,
    backend: str = "auto",
    max_frames: int | None = None,
    target_fps: float = 30.0,
    cols: int = 100,
    sampler: str = "random",
):
    scene, cam, *_ = presets.get_config(config, width, height)
    engine = Engine(scene, cam, width, height, spp=1, max_depth=8,
                    backend=backend, sampler=sampler)
    engine.set_paused(False)

    held: dict = {}
    frame = 0
    out = sys.stdout
    with _RawTerminal() as term:
        out.write("\x1b[2J")  # clear
        try:
            while max_frames is None or frame < max_frames:
                now = time.monotonic() * 1000.0
                for k in term.read_keys():
                    if k == "q":
                        return frame
                    elif k == "p":
                        engine.set_paused(not engine.app.is_paused)
                    elif k == "r":
                        engine.reset()
                    elif k == "x":
                        # render-before-save + paused 25-spp floor
                        # (src/dom.rs:115-124, src/webgl.rs:342-347)
                        engine.request_save(f"viewer_{frame}.png")
                    elif k == "g":
                        # debug visualization toggle (cursor marker +
                        # selection outline — runs IN the Pallas kernel;
                        # restarts accumulation so the overlay shows/clears
                        # immediately)
                        engine.set_debugging(not engine.app.enable_debugging)
                    elif k == "+":
                        engine.handle_wheel(-1.0)
                    elif k == "-":
                        engine.handle_wheel(+1.0)
                    elif k == "i":
                        engine.handle_mouse_move(0.0, -LOOK_STEP)
                    elif k == "k":
                        engine.handle_mouse_move(0.0, +LOOK_STEP)
                    elif k == "j":
                        engine.handle_mouse_move(-LOOK_STEP, 0.0)
                    elif k == "l":
                        engine.handle_mouse_move(+LOOK_STEP, 0.0)
                    elif k in MOVE_KEYS:
                        held[MOVE_KEYS[k]] = now + 200.0  # hold for 200 ms

                for name, until in list(held.items()):
                    engine.handle_key(name, now < until)
                    if now >= until:
                        del held[name]

                engine.tick(now)
                frame += 1

                fps = engine.app.average_fps(now)
                out.write("\x1b[H")  # home
                out.write(frame_to_ansi(engine.framebuffer(), cols))
                status = (
                    f"\n[{config}] frame {frame} "
                    f"acc {int(engine.render_state.render_count)} "
                )
                if fps is not None:
                    status += f"{fps:5.1f} fps "
                status += (
                    "(wasd/ec move, ijkl look, +/- zoom, p pause, "
                    "g debug, x save, q quit)"
                )
                out.write(status + "\x1b[K")
                out.flush()

                dt = time.monotonic() * 1000.0 - now
                sleep_ms = 1000.0 / target_fps - dt
                if sleep_ms > 0:
                    time.sleep(sleep_ms / 1000.0)
        finally:
            out.write("\x1b[0m\n")
            out.flush()
    return frame


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="interactive terminal path tracer")
    p.add_argument("--config", default="demo", choices=sorted(presets.BASELINE_CONFIGS))
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=180)
    p.add_argument(
        "--backend", default="auto", choices=["auto", "jnp", "pallas"]
    )
    p.add_argument("--cols", type=int, default=100)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument(
        "--sampler", default="random", choices=("random", "stratified"),
        help="camera-sample sequencer (stratified = per-pixel "
        "low-discrepancy accumulation across frames)",
    )
    a = p.parse_args()
    from raytracer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    run_viewer(a.config, a.width, a.height, a.backend, a.max_frames,
               cols=a.cols, sampler=a.sampler)
