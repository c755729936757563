"""gBLUP genomic prediction (models/gblup.py) — capability extension
(the reference stops at association; SURVEY.md §0). Parity anchor: the
eigenbasis-computed BLUP must equal the explicit Henderson/GLS formulas
evaluated with dense float64 inverses."""

import numpy as np
import pytest

from mixmogam_tpu.data.genotype import GenotypeData
from mixmogam_tpu.data.simulate import simulate_genotypes, simulate_phenotype
from mixmogam_tpu.models.gblup import gblup, gblup_cv, gblup_predict
from mixmogam_tpu.oracle.kinship import ibs_kinship, scale_k


def _data(n=120, m=400, h2=0.7, n_causal=40, seed=5):
    G, ch, po = simulate_genotypes(n, m, seed=seed)
    y, causal = simulate_phenotype(G, h2=h2, n_causal=n_causal, seed=seed)
    Z = G.astype(np.float64)
    K = scale_k(ibs_kinship(Z))
    return G, y, K


class TestGblupFit:
    def test_explicit_formula_parity(self):
        """u_hat and beta match the dense-inverse GLS/BLUP formulas at the
        fitted delta."""
        _, y, K = _data()
        m = gblup(y, K=K)
        n = len(y)
        H = K + m.delta * np.eye(n)
        Hinv = np.linalg.inv(H)
        X0 = np.ones((n, 1))
        beta = np.linalg.solve(X0.T @ Hinv @ X0, X0.T @ Hinv @ y)
        np.testing.assert_allclose(m.beta, beta, atol=1e-8)
        r = y - X0 @ beta
        u = K @ Hinv @ r
        np.testing.assert_allclose(m.u_hat, u, atol=1e-8)
        np.testing.assert_allclose(m.fitted, X0 @ beta + u, atol=1e-8)

    def test_predict_train_equals_uhat(self):
        _, y, K = _data()
        m = gblup(y, K=K)
        np.testing.assert_allclose(m.predict(K), m.u_hat, atol=1e-10)

    def test_shrinkage(self):
        """BLUP shrinks: fitted genetic values never overshoot the
        centered phenotype in norm."""
        _, y, K = _data()
        m = gblup(y, K=K)
        r = y - float(m.beta[0])
        assert np.linalg.norm(m.u_hat) < np.linalg.norm(r)

    def test_identity_kinship_uniform_shrinkage(self):
        """K = I: u_hat = r/(1+delta) exactly (every sample equally
        unrelated)."""
        rng = np.random.default_rng(0)
        y = rng.normal(size=60)
        m = gblup(y, K=np.eye(60))
        r = y - float(m.beta[0])
        np.testing.assert_allclose(m.u_hat, r / (1 + m.delta), atol=1e-8)

    def test_eig_k_entry(self):
        _, y, K = _data()
        phi, U = np.linalg.eigh(K)
        m1 = gblup(y, K=K)
        m2 = gblup(y, eig_k=(phi, U))
        np.testing.assert_allclose(m2.u_hat, m1.u_hat, atol=1e-7)

    def test_reliability_bounds_and_signal(self):
        _, y, K = _data()
        m = gblup(y, K=K)
        rel = m.reliability()
        assert rel.shape == y.shape
        assert np.all(rel >= 0) and np.all(rel <= 1)
        assert rel.mean() > 0.05  # h2=0.7 data carries real information


class TestGblupPredict:
    def test_holdout_accuracy(self):
        """Polygenic h2=0.8 trait: out-of-sample r must be solidly
        positive (and far above a permuted-kinship control)."""
        G, ch, po = simulate_genotypes(220, 600, seed=9)
        y, _ = simulate_phenotype(G, h2=0.8, n_causal=120, seed=9)
        K = scale_k(ibs_kinship(G.astype(np.float64)))
        rng = np.random.default_rng(1)
        perm = rng.permutation(220)
        train, test = perm[:170], perm[170:]
        y_hat, model = gblup_predict(None, y, train, test, K_all=K)
        r = np.corrcoef(y_hat, y[test])[0, 1]
        assert r > 0.25, r
        # control: destroying the genotype-phenotype link kills r
        sh = rng.permutation(220)
        y_hat0, _ = gblup_predict(None, y[sh], train, test, K_all=K)
        r0 = np.corrcoef(y_hat0, y[sh][test])[0, 1]
        assert r > r0 + 0.15

    def test_genotype_source(self):
        """gblup_predict builds the joint kinship itself from a
        GenotypeData (device int8 path) == precomputed-K result."""
        G, ch, po = simulate_genotypes(80, 300, seed=2)
        y, _ = simulate_phenotype(G, h2=0.7, n_causal=30, seed=2)
        gd = GenotypeData(G, ch, po, [f"s{i}" for i in range(80)])
        K = scale_k(ibs_kinship(gd.dosage_f64()))
        train, test = np.arange(60), np.arange(60, 80)
        a, _ = gblup_predict(gd, y, train, test)
        b, _ = gblup_predict(None, y, train, test, K_all=K)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_fixed_effects_passed_through(self):
        G, _, _ = simulate_genotypes(100, 300, seed=3)
        y, _ = simulate_phenotype(G, h2=0.6, n_causal=30, seed=3)
        cov = np.random.default_rng(4).normal(size=100)
        y = y + 2.0 * cov
        K = scale_k(ibs_kinship(G.astype(np.float64)))
        X = np.column_stack([np.ones(100), cov])
        train, test = np.arange(75), np.arange(75, 100)
        y_hat, model = gblup_predict(None, y, train, test, X=X, K_all=K)
        # the covariate effect is recovered and applied to the holdout
        assert abs(model.beta[1] - 2.0) < 0.5
        r = np.corrcoef(y_hat, y[test])[0, 1]
        assert r > 0.3


class TestGblupCv:
    def test_cv_runs_and_beats_noise(self):
        G, _, _ = simulate_genotypes(150, 500, seed=7)
        y, _ = simulate_phenotype(G, h2=0.8, n_causal=80, seed=7)
        K = scale_k(ibs_kinship(G.astype(np.float64)))
        out = gblup_cv(None, y, n_folds=5, seed=0, K_all=K)
        assert len(out["r_folds"]) == 5
        assert np.isfinite(out["y_hat"]).all()
        assert out["r"] > 0.15, out["r"]


class TestGblupCli:
    def test_cli_predict_cv_and_fit(self, tmp_path, capsys):
        import json

        from mixmogam_tpu.cli import main

        rc = main(["simulate", "-n", "90", "-m", "300", "--h2", "0.8",
                   "--n-causal", "60", "--seed", "13",
                   "-o", str(tmp_path / "sim")])
        assert rc == 0
        capsys.readouterr()
        out_csv = str(tmp_path / "pred.csv")
        rc = main(["predict", str(tmp_path / "sim.genotypes.csv"),
                   str(tmp_path / "sim.phenotypes.csv"),
                   "--folds", "3", "-o", out_csv])
        assert rc == 0
        s = json.loads(capsys.readouterr().out)
        assert s["n"] == 90 and len(s["r_folds"]) == 3
        with open(out_csv) as f:
            assert f.readline().startswith("ecotype_id,y,y_hat_cv")
            assert sum(1 for _ in f) == 90
        # --folds 0: fit on all samples, breeding values out
        rc = main(["predict", str(tmp_path / "sim.genotypes.csv"),
                   str(tmp_path / "sim.phenotypes.csv"),
                   "--folds", "0", "-o", out_csv])
        assert rc == 0
        s = json.loads(capsys.readouterr().out)
        assert 0 <= s["h2"] <= 1
        with open(out_csv) as f:
            assert "genetic_value" in f.readline()


class TestGblupValidation:
    def test_nan_phenotype_raises(self):
        import pytest

        _, y, K = _data(n=80, m=200, seed=1)
        y = y.copy()
        y[3] = np.nan
        with pytest.raises(ValueError, match="fully-observed"):
            gblup(y, K=K)
