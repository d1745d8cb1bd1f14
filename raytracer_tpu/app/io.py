"""Image export: float framebuffer → PNG file/bytes.

The analog of "Save Image" (src/dom.rs:118-143: canvas.toDataURL →
synthetic <a download> click). The device hands back a gamma-encoded f32
(H, W, 3) buffer in GL orientation (row 0 = bottom); export quantizes to
sRGB8, flips to scanline order, and PNG-encodes — through the native C++
runtime (raytracer_tpu/native/fastpng.cpp) when available, else a pure
zlib-Python encoder with identical output format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from raytracer_tpu import native


def tonemap_u8(image, flip_vertical: bool = True) -> np.ndarray:
    """Clamp to [0,1], quantize to u8, flip GL row order to scanline order.
    Uses the native C++ runtime when available; numpy fallback is
    bit-identical."""
    arr = np.ascontiguousarray(image, dtype=np.float32)
    if native.LIB is not None and arr.ndim == 3 and arr.shape[2] == 3:
        import ctypes

        h, w, _ = arr.shape
        out = np.empty((h, w, 3), np.uint8)
        rc = native.LIB.rt_tonemap_u8(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h,
            w,
            1 if flip_vertical else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out
    arr = np.clip(arr, 0.0, 1.0)
    out = (arr * 255.0 + 0.5).astype(np.uint8)
    if flip_vertical:
        out = out[::-1]
    return np.ascontiguousarray(out)


def encode_png(image, flip_vertical: bool = True) -> bytes:
    """f32 (H, W, 3) → PNG bytes. Native C++ fast path, python fallback."""
    data = native.encode_png_native(image, flip_vertical=flip_vertical)
    if data is not None:
        return data
    return _encode_png_py(tonemap_u8(image, flip_vertical))


def _encode_png_py(rgb8: np.ndarray) -> bytes:
    h, w, _ = rgb8.shape
    raw = b"".join(b"\x00" + rgb8[y].tobytes() for y in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def save_png(path: str, image, flip_vertical: bool = True) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(image, flip_vertical=flip_vertical))


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder for round-trip tests (8-bit RGB, filter 0/1/2/3/4)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and color == 2, "only 8-bit RGB supported"
        elif typ == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        filt = raw[p]
        row = np.frombuffer(raw[p + 1 : p + 1 + stride], np.uint8).astype(np.int32)
        p += 1 + stride
        if filt == 0:
            cur = row
        elif filt == 2:  # Up
            cur = (row + prev) % 256
        else:  # Sub/Average/Paeth need sequential passes
            cur = row.copy()
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                if filt == 1:
                    cur[i] = (cur[i] + a) % 256
                elif filt == 3:
                    cur[i] = (cur[i] + (a + b) // 2) % 256
                elif filt == 4:
                    c = prev[i - 3] if i >= 3 else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) % 256
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, 3)
