"""Full-resolution terminal frame display via the kitty graphics protocol.

The reference shows the WHOLE canvas progressively (the browser blits the
full-resolution WebGL framebuffer every frame, /root/reference/src/dom.rs:
277-291 sizes it to the window). The ANSI half-block viewer necessarily
downsamples to character cells; this module closes that gap for terminals
that speak the kitty graphics protocol (kitty, ghostty, recent wezterm):
each frame is PNG-encoded (native C++ encoder when available) and
transmitted pixel-perfect with `ESC _ G ... ESC \\` application commands.

Protocol framing (kitty graphics spec):

* every command is ``ESC _ G <k=v,...> ; <base64 payload> ESC \\``
* payloads over ``CHUNK`` base64 bytes are split across commands carrying
  ``m=1`` (more coming) with the final command carrying ``m=0``; only the
  first carries the full control keys
* ``a=T`` transmit+display at the cursor, ``f=100`` = PNG format,
  ``i=<id>`` names the image so retransmission replaces the previous
  frame's data, ``q=2`` suppresses the terminal's OK/error responses
  (we render fire-and-forget at frame rate)
* each frame is preceded by ``a=d,d=i,i=<id>`` deleting the previous
  placement, so a session is one image slot updated in place — not an
  unbounded scrollback of frames

Pure string assembly over the existing PNG encoders — unit-testable
without a terminal (tests/test_viewer.py round-trips the payload through
the PNG decoder).
"""

from __future__ import annotations

import base64

import numpy as np

#: max base64 bytes per escape command (the kitty spec's chunk limit)
CHUNK = 4096


def encode_frame_png(img: np.ndarray) -> bytes:
    """f32 (H, W, 3) GL-row-order framebuffer → PNG bytes (display
    orientation: row 0 at the top, like the canvas blit)."""
    from raytracer_tpu.native import encode_png_native

    data = encode_png_native(img, flip_vertical=True)
    if data is not None:
        return data
    from raytracer_tpu.app.io import encode_png

    return encode_png(img, flip_vertical=True)


def kitty_frame(img: np.ndarray, image_id: int = 1) -> str:
    """One full-resolution frame as a kitty-graphics command string.

    Returns the delete-previous-placement command followed by the
    chunked transmit-and-display commands; the caller positions the
    cursor (the viewer homes it before every frame, so the image
    replaces itself in place like the reference's canvas)."""
    payload = base64.standard_b64encode(encode_frame_png(img)).decode("ascii")
    cmds = [f"\x1b_Ga=d,d=i,i={image_id},q=2\x1b\\"]
    chunks = [payload[i:i + CHUNK] for i in range(0, len(payload), CHUNK)] or [""]
    for n, chunk in enumerate(chunks):
        more = 1 if n + 1 < len(chunks) else 0
        if n == 0:
            keys = f"a=T,f=100,i={image_id},q=2,m={more}"
        else:
            keys = f"m={more}"
        cmds.append(f"\x1b_G{keys};{chunk}\x1b\\")
    return "".join(cmds)


def parse_kitty_commands(s: str) -> list[tuple[dict, str]]:
    """Inverse of :func:`kitty_frame` for tests: split a command string
    into ``(keys_dict, base64_chunk)`` tuples."""
    out = []
    for part in s.split("\x1b\\"):
        if not part:
            continue
        assert part.startswith("\x1b_G"), f"not a kitty command: {part[:20]!r}"
        body = part[3:]
        keys, _, chunk = body.partition(";")
        kv = dict(k.split("=") for k in keys.split(",") if k)
        out.append((kv, chunk))
    return out
