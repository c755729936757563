"""Reference-compatible class facade tests (compat.LinearModel /
LinearMixedModel / lm_step_wise; reference: linear_models.py classes,
SURVEY.md §2.1). Everything is pinned against the functional core it
delegates to and/or the scipy oracle."""

import numpy as np
import pytest

from mixmogam_tpu import oracle
from mixmogam_tpu.compat import LinearMixedModel, LinearModel, lm_step_wise


class TestLinearModelCompat:
    def test_least_square_estimate_matches_numpy(self, tiny_dataset):
        y = tiny_dataset["y"]
        lm = LinearModel(y)
        cov = tiny_dataset["G"][5]
        assert lm.add_factor(cov)
        est = lm.least_square_estimate()
        X = np.column_stack([np.ones_like(y), cov])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        np.testing.assert_allclose(est["betas"], beta, atol=1e-10)
        resid = y - X @ beta
        assert abs(est["rss"] - resid @ resid) < 1e-8

    def test_add_factor_rejects_collinear(self, tiny_dataset):
        lm = LinearModel(tiny_dataset["y"])
        cov = tiny_dataset["G"][5]
        assert lm.add_factor(cov)
        assert not lm.add_factor(2.0 * cov + 3.0)   # in span(1, cov)
        assert lm.p == 2

    def test_add_factor_wrong_length_raises(self, tiny_dataset):
        lm = LinearModel(tiny_dataset["y"])
        with pytest.raises(ValueError):
            lm.add_factor(np.ones(3))

    def test_fast_f_test_matches_linear_model(self, tiny_dataset):
        from mixmogam_tpu.models.linear import linear_model

        G, y = tiny_dataset["G"], tiny_dataset["y"]
        lm = LinearModel(y)
        lm.add_factor(G[7])
        d = lm.fast_f_test(G[:30], tile=32)
        X0 = np.column_stack([np.ones_like(y), G[7]])
        ref = linear_model(G[:30], y, X0=X0, tile=32)
        np.testing.assert_allclose(d["ps"], ref["ps"], atol=1e-12)


class TestLinearMixedModelCompat:
    def test_remle_matches_oracle(self, tiny_dataset, kinship_tiny):
        y, K = tiny_dataset["y"], kinship_tiny
        lmm = LinearMixedModel(y)
        lmm.add_random_effect(K)
        r = lmm.get_expedited_REMLE()
        o = oracle.reml(y, np.ones((len(y), 1)), K)
        assert abs(np.log(r["delta"]) - np.log(o["delta"])) < 1e-5
        assert abs(r["pseudo_heritability"]
                   - o["pseudo_heritability"]) < 1e-6
        assert abs(r["max_ll"] - o["ll"]) < 1e-5
        assert abs(r["vg"] - o["sigma_g2"]) < 1e-6

    def test_requires_random_effect(self, tiny_dataset):
        lmm = LinearMixedModel(tiny_dataset["y"])
        with pytest.raises(ValueError):
            lmm.get_expedited_REMLE()

    def test_eigen_layouts(self, tiny_dataset, kinship_tiny):
        y, K = tiny_dataset["y"], kinship_tiny
        lmm = LinearMixedModel(y)
        eL = lmm._get_eigen_L_(K)
        n = len(y)
        assert eL["values"].shape == (n,)
        # vectors are row-eigenvector layout (reference convention)
        recon = eL["vectors"].T @ np.diag(eL["values"]) @ eL["vectors"]
        np.testing.assert_allclose(recon, K, atol=1e-8)
        eR = lmm._get_eigen_R_()
        assert eR["values"].shape == (n - 1,)

    def test_emmax_f_test_matches_functional(self, tiny_dataset,
                                             kinship_tiny):
        from mixmogam_tpu.models.emmax import emmax

        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        lmm = LinearMixedModel(y)
        lmm.add_random_effect(K)
        lmm.add_factor(G[3])
        d = lmm.emmax_f_test(G[:40], tile=64)
        X0 = np.column_stack([np.ones_like(y), G[3]])
        ref = emmax(G[:40], y, K=K, X0=X0, tile=64)
        np.testing.assert_allclose(d["ps"], ref["ps"], atol=1e-10)

    def test_get_estimates_gls_betas(self, tiny_dataset, kinship_tiny):
        """GLS betas at the REML delta vs a direct solve of
        (X' H^-1 X) b = X' H^-1 y."""
        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        lmm = LinearMixedModel(y)
        lmm.add_random_effect(K)
        lmm.add_factor(G[3])
        est = lmm.get_estimates()
        H = K + est["delta"] * np.eye(len(y))
        Hi = np.linalg.inv(H)
        X = lmm.X
        beta = np.linalg.solve(X.T @ Hi @ X, X.T @ Hi @ y)
        np.testing.assert_allclose(est["betas"], beta, atol=1e-6)
        assert est["beta_ses"].shape == beta.shape
        assert np.all(est["beta_ses"] > 0)

    def test_ml_ll_at_least_reml_likelihood_shape(self, tiny_dataset,
                                                  kinship_tiny):
        y, K = tiny_dataset["y"], kinship_tiny
        lmm = LinearMixedModel(y)
        lmm.add_random_effect(K)
        ml = lmm.get_ML()
        o = oracle.ml(y, np.ones((len(y), 1)), K)
        assert abs(ml["max_ll"] - o["ll"]) < 1e-5

    def test_perm_and_twosnp_delegate(self, tiny_dataset, kinship_tiny):
        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        lmm = LinearMixedModel(y)
        lmm.add_random_effect(K)
        p = lmm.emmax_perm_test(G[:16], num_perm=8, tile=16)
        assert p["min_ps"].shape == (8,)
        t = lmm.emmax_two_snps(G[:12], focal_idx=[0, 1], tile=16)
        assert t["cond_ps"].shape == (2, 12)


class TestLmStepwise:
    def test_first_step_picks_ols_argmin(self, tiny_dataset):
        from mixmogam_tpu.models.linear import linear_model

        G, y = tiny_dataset["G"], tiny_dataset["y"]
        out = lm_step_wise(G, y, max_steps=2, tile=64, save_scans=True)
        ref = linear_model(G, y, tile=64)
        np.testing.assert_allclose(out["steps"][0]["scan_ps"], ref["ps"],
                                   atol=1e-8)
        assert out["steps"][0]["min_p_snp"] == int(np.argmin(ref["ps"]))
        assert out["steps"][0]["pseudo_heritability"] == 0.0

    def test_identity_path_equals_explicit_identity_eigk(self,
                                                         tiny_dataset):
        """K=None (no rotation matmuls) must match the explicit
        eig_k=(ones, I) route step for step — including the STREAMED
        branch (rot_budget_bytes=0 forces tile streaming)."""
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        G, y = tiny_dataset["G"], tiny_dataset["y"]
        n = len(y)
        a = lm_step_wise(G, y, max_steps=2, tile=64)
        b = emmax_step_wise(G, y, max_steps=2, tile=64,
                            eig_k=(np.ones(n), np.eye(n)))
        c = lm_step_wise(G.astype(np.int8), y, max_steps=2, tile=64,
                         rot_budget_bytes=0)
        for s_a, s_b, s_c in zip(a["steps"], b["steps"], c["steps"]):
            assert s_a["cofactors"] == s_b["cofactors"] == s_c["cofactors"]
            assert abs(s_a["bic"] - s_b["bic"]) < 1e-6
            assert abs(s_a["bic"] - s_c["bic"]) < 1e-6

    def test_criteria_finite_and_selection_present(self, tiny_dataset):
        G, y = tiny_dataset["G"], tiny_dataset["y"]
        out = lm_step_wise(G, y, max_steps=2, tile=64)
        for s in out["steps"]:
            assert np.isfinite(s["bic"]) and np.isfinite(s["ebic"])
        assert set(out["selected"]) == {"bic", "ebic", "mbic", "mbonf"}


class TestReferenceAliases:
    def test_genotype_aliases(self):
        from mixmogam_tpu.data.genotype import GenotypeData, SNPsDataSet
        from mixmogam_tpu.data.phenotype import PhenotypeData

        assert SNPsDataSet is GenotypeData
        G = np.array([[0, 1, 1, 0], [1, 1, 0, 0], [0, 0, 0, 1]], np.int8)
        gd = GenotypeData(G, [1, 1, 2], [100, 200, 50],
                          ["a", "b", "c", "d"])
        np.testing.assert_array_equal(
            gd.get_region_snps(1, 150, 250), G[1:2])
        ph = PhenotypeData.from_arrays(
            1, "trait", ["a", "b", "c"], [1.0, 2.0, 3.0])
        sub, y, ids = gd.coordinate_w_phenotype_data(ph, 1)
        assert ids == ["a", "b", "c"] and len(y) == 3

    def test_package_level_exports(self):
        import mixmogam_tpu

        assert mixmogam_tpu.LinearMixedModel is LinearMixedModel
        assert mixmogam_tpu.lm_step_wise is lm_step_wise
