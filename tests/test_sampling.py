"""Distribution tests for the sampling primitives (reference distributions:
static/shader.frag:114-133) and determinism of the counter-based RNG."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core import sampling

N = 20000


def test_unit_sphere_inside_and_uniform(key):
    pts = np.asarray(sampling.random_in_unit_sphere(key, (N,)))
    r = np.linalg.norm(pts, axis=-1)
    assert (r <= 1.0 + 1e-5).all()
    # radius^3 should be uniform for a volume-uniform distribution
    u = r**3
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    assert hist.min() > N / 10 * 0.85
    # mean should be ~0 per component
    assert np.abs(pts.mean(axis=0)).max() < 0.02


def test_unit_vector_on_sphere(key):
    v = np.asarray(sampling.random_unit_vector(key, (N,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # isotropy: each component mean ~ 0, cos distribution uniform
    assert np.abs(v.mean(axis=0)).max() < 0.02
    hist, _ = np.histogram(v[:, 2], bins=10, range=(-1, 1))
    assert hist.min() > N / 10 * 0.85


def test_unit_disk_inside_and_uniform(key):
    d = np.asarray(sampling.random_in_unit_disk(key, (N,)))
    assert d.shape == (N, 2)
    r2 = (d**2).sum(axis=-1)
    assert (r2 <= 1.0 + 1e-5).all()
    # r^2 uniform for area-uniform sampling
    hist, _ = np.histogram(r2, bins=10, range=(0, 1))
    assert hist.min() > N / 10 * 0.85


def test_determinism_same_key(key):
    a = sampling.random_in_unit_sphere(key, (64,))
    b = sampling.random_in_unit_sphere(key, (64,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_distinct_streams(key):
    a = np.asarray(sampling.random_in_unit_sphere(sampling.fold(key, 0, 1), (8,)))
    b = np.asarray(sampling.random_in_unit_sphere(sampling.fold(key, 0, 2), (8,)))
    assert not np.allclose(a, b)


def test_pixel_jitter_range(key):
    j = np.asarray(sampling.pixel_jitter(key, (1000,)))
    assert j.shape == (1000, 2)
    assert (j >= 0).all() and (j < 1).all()


def test_bounce_uniforms_shapes(key):
    uv, us, g = sampling.sphere_disk_glass_uniforms(key, (17,))
    assert uv.shape == (17, 3) and us.shape == (17, 3) and g.shape == (17,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(uv), axis=-1), 1.0, atol=1e-5)


def test_unit_vector_guards_zero_norm():
    """jax.random.uniform can return exactly 0.0 (~2^-23/draw), making the
    sphere sample (0,0,0); the normalize must not produce NaN (the Pallas
    kernel's _normalize3 uses the same eps guard)."""
    from raytracer_tpu.core import vec

    z = jnp.zeros((4, 3), jnp.float32)
    assert bool(jnp.isfinite(vec.normalize(z, eps=1e-20)).all())
    # and a large batch of real draws is finite end to end
    v = sampling.random_unit_vector(jax.random.PRNGKey(123), (1 << 20,))
    assert bool(jnp.isfinite(v).all())


# --- stratified (R2 low-discrepancy) camera sampler --------------------------


def test_r2_point_range_and_rotation(key):
    cp = jax.random.uniform(key, (64, 4), jnp.float32)
    for s in (0, 1, 7, 499):
        p = np.asarray(sampling.r2_point(cp, s))
        assert p.shape == (64, 4)
        assert (p >= 0).all() and (p < 1).all()
    # s=0 is the rotation itself
    np.testing.assert_allclose(
        np.asarray(sampling.r2_point(cp, 0)), np.asarray(cp), atol=1e-6
    )


def test_r2_point_exact_at_large_sample_index(key):
    """Regression for the review-found f32 recurrence freeze: frac(cp +
    s·alpha) in f32 quantizes once s·alpha outgrows the 24-bit mantissa
    (by s≈2^17 draws collapse onto ~128 levels and a progressive session
    stops converging). The fixed-point form must stay exact far beyond
    that: at s ~ 2^25, consecutive draws still step by exactly alpha
    (mod 1, to the 24-bit output quantum) and a window of draws stays
    fully distinct per dim."""
    cp = jax.random.uniform(key, (1, 4), jnp.float32)
    s0 = 1 << 25
    p0 = np.asarray(sampling.r2_point(cp, s0), np.float64)[0]
    p1 = np.asarray(sampling.r2_point(cp, s0 + 1), np.float64)[0]
    step = (p1 - p0) % 1.0
    expect = [a / 2.0 ** 32 for a in
              sampling.alphas_fixed32(sampling.R2_ALPHAS_4D)]
    np.testing.assert_allclose(step, expect, atol=2.0 ** -23)
    # a 256-draw window deep into the sequence: every dim's draws are
    # pairwise distinct (the frozen recurrence repeats values) and span
    # the unit interval
    win = np.asarray(
        sampling.r2_point(cp, s0 + jnp.arange(256)[:, None]), np.float64
    )[:, 0, :]
    assert win.shape == (256, 4)
    for d in range(4):
        vals = win[:, d]
        assert len(np.unique(vals)) == 256, f"dim {d} collapsed"
        assert vals.min() < 0.1 and vals.max() > 0.9


def test_r2_prefix_stratification():
    """Every prefix of the per-pixel sequence must out-spread random points:
    the 2-D jitter projection's min pairwise distance beats random's (that
    is the whole point of the additive recurrence)."""
    cp = jnp.zeros((4,), jnp.float32)
    n = 32
    pts = np.asarray(
        jnp.stack([sampling.r2_point(cp, s) for s in range(n)])
    )

    def min_pair_dist(xy):
        d = np.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
        return d[~np.eye(n, dtype=bool)].min()

    rng = np.random.default_rng(0)
    rand_mpd = np.median(
        [min_pair_dist(rng.random((n, 2))) for _ in range(16)]
    )
    assert min_pair_dist(pts[:, 0:2]) > 2.0 * rand_mpd  # jitter pair
    assert min_pair_dist(pts[:, 2:4]) > 2.0 * rand_mpd  # lens pair


def test_disk_from_uv_matches_reference_map(key):
    """disk_from_uv is the same sqrt-radius polar map the random sampler's
    distribution realizes: area-uniform on the unit disk."""
    u, v = jax.random.uniform(key, (2, N), jnp.float32)
    d = np.asarray(sampling.disk_from_uv(u, v))
    r2 = (d**2).sum(axis=-1)
    assert (r2 <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(r2, np.asarray(v), atol=1e-5)  # r = sqrt(v)
    hist, _ = np.histogram(r2, bins=10, range=(0, 1))
    assert hist.min() > N / 10 * 0.85
    ang = np.arctan2(d[:, 1], d[:, 0])
    hist, _ = np.histogram(ang, bins=8, range=(-np.pi, np.pi))
    assert hist.min() > N / 8 * 0.85


def test_unit_vector_from_uv_matches_reference_law(key):
    """The Archimedes (hx, phi) map must give the same distribution as
    random_unit_vector (uniform on the sphere): unit norm, isotropy,
    uniform cos — the same checks test_unit_vector_on_sphere applies to
    the key-based sampler."""
    u, v = jax.random.uniform(key, (2, N), jnp.float32)
    p = np.asarray(sampling.unit_vector_from_uv(u, v))
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-5)
    assert np.abs(p.mean(axis=0)).max() < 0.02
    hist, _ = np.histogram(p[:, 2], bins=10, range=(-1, 1))
    assert hist.min() > N / 10 * 0.85


def test_r2_alpha_dims_jointly_equidistribute():
    """All 7 stratified dims (4 camera + 3 bounce-0) share one Kronecker
    index per pixel, so every PAIR of dims must jointly equidistribute —
    a reused alpha makes the pair's difference constant mod 1 and biases
    any integrand coupling the two dims (the rank-deficiency defect the
    round-3 review caught: shared alphas left a non-decaying 6e-2 error;
    scripts/probe_r2_alphas.py). Checks the fixed-point forms actually
    consumed by both implementations, plus empirical cross-pair
    integration of f(u,v)=[u<0.5]*v (truth 0.25) over every dim pair."""
    alphas = sampling.alphas_fixed32(
        sampling.R2_ALPHAS_4D + sampling.R2_ALPHAS_B0
    )
    assert len(set(alphas)) == len(alphas), "reused alpha: rank-deficient"
    n = 1 << 14
    s = np.arange(n, dtype=np.uint64)
    dims = [((np.uint64(a) * s) % (1 << 32)) / float(1 << 32)
            for a in alphas]
    for i in range(len(dims)):
        for j in range(i + 1, len(dims)):
            est = float(((dims[i] < 0.5) * dims[j]).mean())
            assert abs(est - 0.25) < 5e-3, (i, j, est)
