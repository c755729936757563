"""Profile-likelihood CI for pseudo-heritability (ops/reml.py
h2_profile_ci) — extension beyond the reference's point estimate.
Pinned against a brute-force fine-grid inversion of the same
X-explicit likelihood."""

import numpy as np
from scipy.stats import chi2

from mixmogam_tpu.data.simulate import simulate_genotypes, simulate_phenotype
from mixmogam_tpu.ops.reml import (_explicit_ll_host, fit_null_model,
                                   h2_profile_ci)
from mixmogam_tpu.oracle.kinship import ibs_kinship, scale_k


def _fit(n=200, m=600, h2=0.6, seed=21):
    G, _, _ = simulate_genotypes(n, m, seed=seed)
    y, _ = simulate_phenotype(G, h2=h2, n_causal=max(10, m // 10),
                              seed=seed)
    K = scale_k(ibs_kinship(G.astype(np.float64)))
    null = fit_null_model(y, np.ones((n, 1)), K=K)
    return null


class TestH2ProfileCi:
    def test_contains_point_estimate(self):
        null = _fit()
        lo, hi = h2_profile_ci(null)
        h2 = float(null.pseudo_heritability)
        assert 0.0 <= lo <= h2 <= hi <= 1.0
        assert hi - lo < 0.999  # informative at n=200

    def test_brute_force_grid_parity(self):
        """Endpoints match a dense-grid inversion of the same
        likelihood to ~the grid resolution."""
        null = _fit(n=150, m=400, seed=4)
        lo, hi = h2_profile_ci(null, level=0.95)
        U = np.asarray(null.U, np.float64)
        ll_at, _, _, _ = _explicit_ll_host(
            np.asarray(null.phi, np.float64),
            U.T @ np.asarray(null.y, np.float64),
            U.T @ np.asarray(null.X0, np.float64))
        cut = ll_at(float(null.log_delta)) - 0.5 * chi2.ppf(0.95, 1)
        grid = np.linspace(-10, 10, 20001)
        inside = np.array([ll_at(g) for g in grid]) >= cut
        ld_in = grid[inside]
        lo_b = 1.0 / (1.0 + np.exp(ld_in.max()))
        hi_b = 1.0 / (1.0 + np.exp(ld_in.min()))
        # crossing located to ~1e-3 in log-delta => tight in h2
        assert abs(lo - lo_b) < 2e-3, (lo, lo_b)
        assert abs(hi - hi_b) < 2e-3, (hi, hi_b)

    def test_level_ordering(self):
        null = _fit(seed=9)
        lo90, hi90 = h2_profile_ci(null, level=0.90)
        lo99, hi99 = h2_profile_ci(null, level=0.99)
        assert lo99 <= lo90 and hi90 <= hi99
        assert (hi99 - lo99) > (hi90 - lo90)

    def test_null_trait_boundary(self):
        """h2 ~ 0 trait: the interval collapses toward 0 at the bottom
        and stays well below 1 at the top (n is informative)."""
        rng = np.random.default_rng(3)
        G, _, _ = simulate_genotypes(250, 500, seed=3)
        y = rng.normal(size=250)  # no genetic signal at all
        K = scale_k(ibs_kinship(G.astype(np.float64)))
        null = fit_null_model(y, np.ones((250, 1)), K=K)
        lo, hi = h2_profile_ci(null)
        assert lo <= 0.05
        assert hi < 0.95

    def test_width_shrinks_with_n(self):
        w = {}
        for n in (80, 500):
            null = _fit(n=n, m=500, seed=13)
            lo, hi = h2_profile_ci(null)
            w[n] = hi - lo
        assert w[500] < w[80]
