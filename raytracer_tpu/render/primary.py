"""Primary-bounce candidate windows: per-tile-row sphere lists for the
two-phase cover-class render (VERDICT r2 #1).

Measured on the cover scene (PERF.md): a 128-pixel row's PRIMARY beam
touches a union of ~4 grid cells (~18 spheres) out of 487 — but only at
bounce 0; after one bounce ray origins scatter across the whole scene.
So the only exact, SIMD-clean way to exploit it is a phase split: a
primary kernel whose grid step reads a SMALL per-row candidate table
through its BlockSpec, and an extension kernel that continues the
surviving paths from bounce 1 with the full scan.

This module builds the candidate tables on the host (numpy, f64):

Geometry. A primary ray of pixel (px, py), jitter u,v in [0,1) and lens
sample a (|a| <= lens_radius in the camera's u,v plane) is
    X(tau) = (1 - tau) * (o + a) + tau * P(st),
where P(st) = llc + s*H + t*V is the focus-plane point and
st = ((px+.5+u)/w, (py+.5+v)/h)  (shader.frag:342-351, 365-369 — the
reference jitters FORWARD of the fragment center). The union over a
window of pixels is contained in
    Minkowski( cone(o, axis, theta + eps_lens), ball(0, lens_radius) ),
with axis through the window's focus-rect center, theta the max apex
angle to the rect's corners, and eps_lens = asin(lens/d_min) the extra
angular spread lens offsets can add to a direction. A sphere is a
candidate iff dist(center, cone) <= |radius| + lens_radius + margin —
a CONSERVATIVE superset, so the windowed closest-hit scan is exact: the
true winner is always in the window, and non-candidates can never win.
"""

from __future__ import annotations

import numpy as np

#: absolute + scale-relative slack covering f32 device arithmetic vs the
#: f64 host analysis (hit points wander ~1e-6 x scale; 1e-3 is 1000x that)
_MARGIN = 1e-3


def _point_cone_distance(v, axis, theta):
    """Distance from points v (N,3) to the solid one-sided cone at the
    origin with unit axis and half-angle theta (radians)."""
    norm = np.linalg.norm(v, axis=-1)
    norm_safe = np.maximum(norm, 1e-12)
    cosang = np.clip((v @ axis) / norm_safe, -1.0, 1.0)
    ang = np.arccos(cosang)
    out = np.where(
        ang <= theta,
        0.0,
        np.where(
            ang - theta < np.pi / 2,
            norm * np.sin(np.minimum(ang - theta, np.pi / 2)),
            norm,
        ),
    )
    return np.where(norm < 1e-9, 0.0, out)


def candidate_windows(
    scene,
    dcam,
    width: int,
    height: int,
    band_px: tuple[int, int],
    band_rows: int,
):
    """Per-window candidate sphere indices for the primary bounce.

    Windows tile the image into blocks of ``band_px`` = (cols) pixels
    wide and ``band_rows`` pixel rows tall (the kernel's row granularity).
    Returns a list of np.ndarray index lists, window-major with x fastest
    (same order as the kernel grid), over the PADDED tile grid — windows
    fully outside the image get empty lists.
    """
    import jax

    c, r, act, o, llc, hh, vv, lens = jax.device_get((
        scene.center, scene.radius, scene.active, dcam.origin,
        dcam.lower_left_corner, dcam.horizontal, dcam.vertical,
        dcam.lens_radius,
    ))
    c = np.asarray(c, np.float64)
    r = np.abs(np.asarray(r, np.float64))
    act = np.asarray(act, np.float64) > 0.0
    o = np.asarray(o, np.float64)
    llc = np.asarray(llc, np.float64)
    hh = np.asarray(hh, np.float64)
    vv = np.asarray(vv, np.float64)
    lens = float(lens)
    # mirror _slot_encoding's world-extent bound: beyond-MAX_T slots are
    # unhittable in the full scan too
    from raytracer_tpu.render.options import MAX_T

    hittable = act & (np.linalg.norm(c, axis=-1) - r <= MAX_T)

    cols, _ = band_px if isinstance(band_px, tuple) else (band_px, 0)

    def focus_point(px, py):
        s = px / width
        t = py / height
        return llc + s * hh + t * vv

    windows = []
    ny = -(-height // band_rows)
    nx = -(-width // cols)
    for wy in range(ny):
        for wx in range(nx):
            px0, px1 = wx * cols, min((wx + 1) * cols, width)
            py0, py1 = wy * band_rows, min((wy + 1) * band_rows, height)
            if px0 >= width or py0 >= height:
                windows.append(np.zeros((0,), np.int64))
                continue
            # jitter spans +0.5..+1.5 of the pixel index (forward jitter)
            corners = [
                focus_point(px0 + 0.5, py0 + 0.5),
                focus_point(px1 - 1 + 1.5, py0 + 0.5),
                focus_point(px0 + 0.5, py1 - 1 + 1.5),
                focus_point(px1 - 1 + 1.5, py1 - 1 + 1.5),
            ]
            center = focus_point(
                (px0 + px1) / 2.0 + 0.5, (py0 + py1) / 2.0 + 0.5
            )
            axis = center - o
            d_axis = np.linalg.norm(axis)
            axis = axis / d_axis
            theta = 0.0
            d_min = d_axis
            for q in corners:
                vq = q - o
                dq = np.linalg.norm(vq)
                d_min = min(d_min, dq)
                theta = max(
                    theta,
                    np.arccos(np.clip((vq / dq) @ axis, -1.0, 1.0)),
                )
            if lens > 0.0:
                theta += np.arcsin(min(1.0, lens / max(d_min, 1e-9)))
            dist = _point_cone_distance(c - o, axis, theta)
            scale = np.linalg.norm(c, axis=-1) + r + d_axis
            ok = hittable & (
                dist <= r + lens + _MARGIN * (1.0 + scale)
            )
            windows.append(np.nonzero(ok)[0])
    return windows


def window_stats(windows):
    sizes = np.array([len(w) for w in windows], np.int64)
    if len(sizes) == 0 or not (sizes > 0).any():
        return {"n": len(windows), "mean": 0.0, "p50": 0.0, "p90": 0.0, "max": 0}
    nz = sizes[sizes > 0]
    return {
        "n": len(windows),
        "mean": float(nz.mean()),
        "p50": float(np.percentile(nz, 50)),
        "p90": float(np.percentile(nz, 90)),
        "max": int(sizes.max()),
    }
