"""Why the bounce-0 stratification dims need their OWN alphas.

Per pixel, all 7 stratified dims (4 camera + 3 first-bounce) share one
Kronecker index s: point_s[d] = frac(cp[d] + s*alpha[d]). If any two
dims REUSE an alpha, their difference is constant mod 1 within a pixel
— the joint sequence is rank-deficient, and any integrand coupling the
two dims converges to a line integral instead of the area integral: a
per-pixel bias that more samples never remove (the independent
Cranley-Patterson rotations only randomize WHICH wrong value each pixel
gets). This probes the cross-pair integration error of f(u,v) =
[u<0.5]*v (truth 0.25 — a silhouette-edge-over-diffuse-shading
integrand) between the camera jitter_u dim (plastic 1/g) and candidate
diffuse-hx alphas, plus each candidate pair's own 2-D spread.

Output (n=20000 samples, 200 rotations; run on CPU, pure numpy):

    random mpd(n=32) median: 0.0187
    shared-plastic(OLD)   own mpd=0.1410  crossbias mean=6.2e-02 max=1.3e-01
    supergolden(CURRENT)  own mpd=0.1112  crossbias mean=3.7e-04 max=8.3e-04
    sqrt7-11              own mpd=0.0803  crossbias mean=5.7e-05 max=2.0e-04

The shared pair's cross bias is non-decaying (flat from n=1e3 to 2e5);
both distinct candidates decay like a proper LDS. The supergolden pair
(x^3 = x^2 + 1) is chosen: ~1.4x better own-pair spread than sqrt7-11
(0.111 vs 0.080 min pairwise distance at 32 points; plastic's optimal
0.141 is unavailable — it is the camera jitter pair), cross bias three
orders below the shared pair and far below the renderer's noise floor.
"""

import numpy as np

PLASTIC = 1.3247179572447460
SUPER = 1.4655712318767682  # supergolden: real root of x^3 = x^2 + 1
pairs = {
    "shared-plastic(OLD)": (1 / PLASTIC, 1 / PLASTIC**2),
    "supergolden(CURRENT)": (1 / SUPER, 1 / SUPER**2),
    "sqrt7-11": (np.sqrt(7) - 2, np.sqrt(11) - 3),
}
JITTER_U = 1 / PLASTIC  # camera dim the bounce-0 hx dim must not alias
GOLD = (np.sqrt(5) - 1) / 2  # glass-roll alpha (1-D)


def seq(alphas, n, cp=0.0):
    s = np.arange(n)[:, None]
    return (cp + s * np.asarray(alphas)) % 1.0


def min_pair_dist(xy):
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    np.fill_diagonal(d, 9)
    return d.min()


def main():
    rng = np.random.default_rng(0)
    n32 = 32
    rand_mpd = np.median(
        [min_pair_dist(rng.random((n32, 2))) for _ in range(32)]
    )
    print(f"random mpd(n={n32}) median: {rand_mpd:.4f}")
    s = np.arange(20000)
    for name, a in pairs.items():
        mpd = min_pair_dist(seq(a, n32))
        errs = []
        for _ in range(200):
            cp = rng.random(2)
            u = (cp[0] + s * JITTER_U) % 1.0
            v = (cp[1] + s * a[0]) % 1.0
            errs.append(abs(((u < 0.5) * v).mean() - 0.25))
        errs = np.array(errs)
        errs_g = []
        for _ in range(100):
            cp = rng.random(2)
            u = (cp[0] + s * GOLD) % 1.0
            v = (cp[1] + s * a[0]) % 1.0
            errs_g.append(abs(((u < 0.5) * v).mean() - 0.25))
        print(
            f"{name:22s} own mpd={mpd:.4f}  "
            f"crossbias(jitter) mean={errs.mean():.2e} max={errs.max():.2e}"
            f"  crossbias(gold) max={max(errs_g):.2e}"
        )


if __name__ == "__main__":
    main()
