"""GxE interaction scan (models/gxe.py) — capability extension.
Parity anchor: every reported F/p must equal a brute-force per-SNP
float64 lstsq in the explicitly-whitened basis at the same delta."""

import numpy as np
from scipy.stats import f as f_dist

from mixmogam_tpu.data.simulate import simulate_genotypes, simulate_phenotype
from mixmogam_tpu.models.gxe import emmax_gxe
from mixmogam_tpu.oracle.kinship import ibs_kinship, scale_k


def _data(n=120, m=200, seed=6):
    G, ch, po = simulate_genotypes(n, m, seed=seed)
    rng = np.random.default_rng(seed)
    env = rng.normal(size=n)
    y, _ = simulate_phenotype(G, h2=0.5, n_causal=10, seed=seed)
    # plant a true GxE effect at SNP 7
    y = y + 1.5 * G[7].astype(float) * env
    K = scale_k(ibs_kinship(G.astype(np.float64)))
    return G, y, env, K


def _brute_force(G, y, env, K, delta):
    """Per-SNP OLS in the explicit H^(-1/2) basis at the given delta."""
    n = len(y)
    phi, U = np.linalg.eigh(K)
    Hinv_sqrt = (U / np.sqrt(phi + delta)) @ U.T
    X0e = np.column_stack([np.ones(n), env])
    ys = Hinv_sqrt @ y
    X0s = Hinv_sqrt @ X0e
    q = X0e.shape[1]

    def rss(cols):
        X = np.column_stack([X0s] + cols)
        r = ys - X @ np.linalg.lstsq(X, ys, rcond=None)[0]
        return float(r @ r)

    rss0 = rss([])
    out = {"marg": [], "inter": [], "joint": []}
    for j in range(G.shape[0]):
        x = G[j].astype(np.float64)
        xs = Hinv_sqrt @ x
        ps_ = Hinv_sqrt @ (x * env)
        r1 = rss([xs])
        r2 = rss([xs, ps_])
        d1 = n - q - 1
        d2 = n - q - 2
        f_m = (rss0 - r1) / (r1 / d1)
        f_i = (r1 - r2) / (r2 / d2)
        f_j = ((rss0 - r2) / 2.0) / (r2 / d2)
        out["marg"].append(f_dist.sf(f_m, 1, d1))
        out["inter"].append(f_dist.sf(f_i, 1, d2))
        out["joint"].append(f_dist.sf(f_j, 2, d2))
    return {k: np.asarray(v) for k, v in out.items()}


class TestGxe:
    def test_brute_force_parity(self):
        G, y, env, K = _data()
        res = emmax_gxe(G, y, env, K=K)
        ref = _brute_force(G, y, env, K, res["delta"])
        m = res["mask_inter"]
        assert m.sum() > 150
        np.testing.assert_allclose(res["marginal_ps"][res["mask"]],
                                   ref["marg"][res["mask"]], atol=1e-8)
        np.testing.assert_allclose(res["inter_ps"][m], ref["inter"][m],
                                   atol=1e-8)
        np.testing.assert_allclose(res["joint_ps"][m], ref["joint"][m],
                                   atol=1e-8)

    def test_planted_interaction_found(self):
        G, y, env, K = _data()
        res = emmax_gxe(G, y, env, K=K)
        assert int(np.argmin(res["inter_ps"])) == 7
        assert res["inter_ps"][7] < 1e-6

    def test_null_env_gives_uniformish_inter(self):
        """Environment with NO interaction effect: inter_ps behave like
        a null distribution (no excess of tiny p-values)."""
        G, _, _ = simulate_genotypes(150, 300, seed=12)
        y, _ = simulate_phenotype(G, h2=0.5, n_causal=10, seed=12)
        env = np.random.default_rng(12).normal(size=150)
        K = scale_k(ibs_kinship(G.astype(np.float64)))
        res = emmax_gxe(G, y, env, K=K)
        m = res["mask_inter"]
        assert (res["inter_ps"][m] < 1e-4).sum() <= 2

    def test_constant_env_raises(self):
        """A constant environment duplicates the intercept — the null
        design is singular and must be refused, not fit."""
        import pytest

        G, y, env, K = _data()
        with pytest.raises(ValueError, match="full column rank"):
            emmax_gxe(G, y, np.ones_like(env), K=K)

    def test_collinear_product_masked_per_snp(self):
        """Binary env with a SNP equal to it: x*e == x for that SNP, so
        ITS interaction test is masked (p = 1) while the rest scan."""
        G, y, env, K = _data()
        env_b = (env > 0).astype(np.float64)
        G = G.copy()
        G[3] = env_b.astype(G.dtype)        # x == e -> x*e == x
        res = emmax_gxe(G, y, env_b, K=K)
        assert not res["mask_inter"][3]
        assert res["inter_ps"][3] == 1.0
        assert res["mask_inter"].sum() > 150

    def test_env_validation(self):
        G, y, env, K = _data()
        import pytest

        with pytest.raises(ValueError, match="complete"):
            emmax_gxe(G, y, np.r_[env[:-1], np.nan], K=K)
        with pytest.raises(ValueError, match="samples"):
            emmax_gxe(G, y, env[:-3], K=K)
