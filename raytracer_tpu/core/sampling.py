"""Deterministic counter-based sampling primitives.

Replaces the reference's two RNGs — the time-seeded stateful hash-chain in
the shader (static/shader.frag:11-36: ``global_seed`` mutated by every draw,
seeded from pixel position + wall-clock ``u_time``) and ``js_sys::Math.random``
on the host (src/math.rs:86-100) — with counter-based ``jax.random``. Keys are
folded from (frame, sample, bounce, purpose), so renders are bitwise
reproducible and shard-invariant, which the reference cannot be.

The *distributions* match the reference exactly:
- unit-sphere: reinder's direct polar method with cbrt radius
  (static/shader.frag:114-121),
- unit-disk: sqrt-radius polar (static/shader.frag:123-129),
- unit vector: normalized unit-sphere sample (static/shader.frag:131-133),
- sub-pixel jitter: uniform [0,1)^2 scaled by 1/(w,h) (static/shader.frag:365-369).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fold(key, *counters: int):
    """Fold a chain of counters into a key: key ⊕ (frame, sample, bounce, ...)."""
    for c in counters:
        key = jax.random.fold_in(key, c)
    return key


def random_in_unit_sphere(key, shape=()):
    """Uniform point *inside* the unit sphere, shape ``shape + (3,)``.

    Exact port of the reference's distribution (static/shader.frag:114-121):
    h = u3 * (2, 2π, 1) - (1, 0, 0); r = h.z^(1/3);
    p = r * (sqrt(1-h.x²)·sin(φ), sqrt(1-h.x²)·cos(φ), h.x).
    """
    u = jax.random.uniform(key, shape + (3,), dtype=jnp.float32)
    hx = u[..., 0] * 2.0 - 1.0
    phi = u[..., 1] * (2.0 * math.pi)
    r = jnp.cbrt(u[..., 2])
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - hx * hx))
    return jnp.stack(
        [r * s * jnp.sin(phi), r * s * jnp.cos(phi), r * hx], axis=-1
    )


def random_unit_vector(key, shape=()):
    """Uniform direction on the unit sphere (static/shader.frag:131-133).

    The norm is eps-guarded: jax.random.uniform returns exactly 0.0 with
    probability ~2^-23 per draw, making the sphere sample (0,0,0) and an
    unguarded divide NaN — which would poison pixels in high-spp renders
    (~100+ lanes per 1e9 draws). The Pallas kernel's _normalize3 guards
    the same way (eps=1e-20), so the backends stay aligned."""
    from raytracer_tpu.core import vec

    v = random_in_unit_sphere(key, shape)
    return vec.normalize(v, eps=1e-20)


def random_in_unit_disk(key, shape=()):
    """Uniform point in the unit disk, shape ``shape + (2,)``
    (static/shader.frag:123-129): a = 2π·u1, r = sqrt(u2)."""
    u = jax.random.uniform(key, shape + (2,), dtype=jnp.float32)
    a = u[..., 0] * (2.0 * math.pi)
    r = jnp.sqrt(u[..., 1])
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a)], axis=-1)


def sphere_disk_glass_uniforms(key, shape=()):
    """One bounce's worth of material randomness, from a single key.

    Returns (unit_vec (...,3), unit_sphere (...,3), glass_u (...,)) — the
    three independent draws `scatter` consumes per bounce
    (static/shader.frag:217, 240, 267).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        random_unit_vector(k1, shape),
        random_in_unit_sphere(k2, shape),
        jax.random.uniform(k3, shape, dtype=jnp.float32),
    )


def pixel_jitter(key, shape=()):
    """Sub-pixel AA jitter in [0,1)^2, to be scaled by 1/(w,h)
    (static/shader.frag:365-369)."""
    return jax.random.uniform(key, shape + (2,), dtype=jnp.float32)


# --- low-discrepancy camera sampling (TraceOptions.sampler='stratified') ----
#
# 4-D Kronecker (additive-recurrence) sequence: point_s = frac(cp + s·alpha).
# The four alphas are TWO independent high-quality 2-D vectors — the R2
# sequence on the plastic constant (g³ = g + 1) for the sub-pixel jitter
# pair, and the classic (√2−1, √3−1) vector for the lens-disk pair. A
# single 4-D generalized-R2 vector (g⁵ = g + 1) was measured first and
# REJECTED: its (lens) pair projection has disk-integration error WORSE
# than random and non-converging (min pairwise distance 0.0085 at 32 pts);
# the two-pair construction keeps both 2-D projections near-optimal while
# the joint 4-D error still beats random ~1.5× (probe in /tmp, numbers in
# PERF.md). Each pixel gets an independent Cranley-Patterson rotation
# ``cp`` (a uniform random 4-vector), so across pixels the samples stay
# uncorrelated while within a pixel the (jitter_u, jitter_v, lens_u,
# lens_v) quadruples are a progressive low-discrepancy set — every prefix
# is well spread, which is exactly what chunked/adaptive renders consume.
# The per-draw marginals are uniform [0,1), so every estimator stays
# unbiased and the physics (and its quirks) are untouched; only the
# variance drops. Beyond the reference (whose RNG is a time-seeded hash
# chain, static/shader.frag:11-36).

_R2_G2 = 1.3247179572447460  # plastic constant: real root of g^3 = g + 1
_SUPERGOLDEN = 1.4655712318767682  # real root of g^3 = g^2 + 1
R2_ALPHAS_4D = (
    1.0 / _R2_G2,  # jitter_u
    1.0 / _R2_G2 ** 2,  # jitter_v
    math.sqrt(2.0) - 1.0,  # lens_u
    math.sqrt(3.0) - 1.0,  # lens_v
)
#: first-bounce stratification dims: diffuse unit-vector (hx, phi) pair
#: on the SUPERGOLDEN additive recurrence + the glass Schlick-roulette
#: roll (1-D golden ratio — the optimal 1-D additive recurrence).
#: The alphas must be distinct from every camera dim: per-pixel the 7
#: dims share ONE index s, so any repeated alpha makes the joint
#: sequence rank-deficient — (jitter_u − diffuse_hx) would be CONSTANT
#: mod 1 within a pixel, a per-pixel bias that more samples never
#: remove (independent Cranley-Patterson rotations only randomize the
#: constant, they don't restore joint equidistribution). Measured
#: (scripts/probe_r2_alphas.py): a shared plastic pair leaves a
#: non-decaying cross-pair integration error of mean 6.2e-2 / max 0.125;
#: the supergolden pair cuts it to ~3.7e-4 at n=2e4 (decaying) while its
#: own 2-D spread stays near-optimal (min pairwise distance 0.111 at 32
#: pts vs plastic's 0.141, random's 0.019). Measured 1.6-1.8x MSE cut on
#: the demo scene beyond camera-only stratification (PERF.md).
R2_ALPHAS_B0 = (
    1.0 / _SUPERGOLDEN,  # diffuse hx
    1.0 / _SUPERGOLDEN ** 2,  # diffuse phi
    (math.sqrt(5.0) - 1.0) / 2.0,  # glass roll
)


def alphas_fixed32(alphas) -> tuple:
    """Each alpha as a 32-bit fixed-point integer round(alpha·2^32) mod
    2^32 — the exact-arithmetic representation :func:`r2_point` and the
    Pallas kernel share. Rejects alphas whose fixed form is 0 (an alpha
    within 2^-33 of 0 or 1 would wrap to a CONSTANT dim: every Kronecker
    point equals the rotation — a silent never-explores bias)."""
    fixed = tuple(int(round(a * 2.0 ** 32)) & 0xFFFFFFFF for a in alphas)
    if any(f == 0 for f in fixed):
        raise ValueError(f"degenerate fixed-point alpha in {alphas}")
    return fixed


def r2_point(cp, s, alphas=R2_ALPHAS_4D):
    """The s-th Kronecker point under rotation ``cp``: frac(cp + s·alpha).

    ``cp``: (..., len(alphas)) uniform rotations; ``s``: scalar or
    broadcastable non-negative sample index (int). Returns values in
    [0,1) with uniform marginals.

    Computed in 32-bit FIXED POINT (alpha as round(alpha·2^32), the sum
    mod 2^32, top 24 bits → f32): exact for every s, where the f32
    recurrence frac(cp + s·alpha) quantizes once s·alpha outgrows the
    24-bit mantissa — at s ≈ 2^17 a stratified progressive session's
    sample positions would collapse onto ~128 levels and the accumulated
    image would stop converging. The fixed-point sequence is exact until
    its 2^32 period, far beyond any session."""
    a = jnp.asarray(alphas_fixed32(alphas), dtype=jnp.uint32)
    # cp enters with f32 (24-bit) precision; keep exactly those bits
    cp_fix = (cp * jnp.float32(2.0 ** 24)).astype(jnp.uint32) << jnp.uint32(8)
    s_u = jnp.asarray(s).astype(jnp.uint32)[..., None]
    x = cp_fix + s_u * a
    return (x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)


#: key-fold salts for the per-pixel Cranley-Patterson rotations — shared
#: by every stratified host path (single-chip tracer and sharded bands)
#: so the rotation streams cannot drift apart
CP_CAMERA_SALT = 0x52D2
CP_BOUNCE0_SALT = 0xB0C


def stratified_rotations(key, p: int):
    """Per-pixel Cranley-Patterson rotations for the stratified sampler:
    ((p, 4) camera dims, (p, 3) first-bounce dims), uniform [0,1).

    Keyed off ``key`` alone — constant across the render and across spp
    chunks (the api layer holds the key fixed while varying
    sample_offset), so every chunk walks the SAME per-pixel Kronecker
    sequence. One implementation serves the single-chip tracer and the
    sharded band path (each band passes its own pixel count)."""
    cp = jax.random.uniform(
        jax.random.fold_in(key, CP_CAMERA_SALT), (p, 4), dtype=jnp.float32
    )
    cp_b0 = jax.random.uniform(
        jax.random.fold_in(key, CP_BOUNCE0_SALT), (p, 3), dtype=jnp.float32
    )
    return cp, cp_b0


def disk_from_uv(u, v):
    """Map uniform (u, v) to the unit disk with the reference's sqrt-radius
    polar transform (static/shader.frag:123-129) — same map the random
    sampler uses, so distributions match."""
    a = u * (2.0 * math.pi)
    r = jnp.sqrt(v)
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a)], axis=-1)


def unit_vector_from_uv(u, v):
    """Uniform unit vector from two uniforms via the Archimedes cylinder
    map: hx = 2u−1, phi = 2πv, p = (s·sinφ, s·cosφ, hx), s = √(1−hx²).

    Same distribution as ``random_unit_vector`` — that one normalizes a
    volume-uniform sphere point whose radius cancels, leaving exactly
    this (hx, phi) law (static/shader.frag:114-121, 131-133). Used by the
    stratified first-bounce diffuse draw."""
    hx = u * 2.0 - 1.0
    phi = v * (2.0 * math.pi)
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - hx * hx))
    return jnp.stack([s * jnp.sin(phi), s * jnp.cos(phi), hx], axis=-1)
