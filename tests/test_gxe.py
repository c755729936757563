"""GxE interaction scan (models/gxe.py) — capability extension.
Parity anchor: every reported F/p must equal a brute-force per-SNP
float64 lstsq in the explicitly-whitened basis at the same delta."""

import numpy as np
import pytest
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


class TestGxeEndToEnd:
    def test_run_gwas_and_cli(self, tmp_path, capsys):
        import json

        from mixmogam_tpu.cli import main
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.phenotype import PhenotypeData

        G, y, env, K = _data(n=100, m=150, seed=8)
        gd = GenotypeData(G, np.repeat(1, 150), np.arange(150) * 100,
                          [f"s{i}" for i in range(100)])
        gfile = str(tmp_path / "g.csv")
        pfile = str(tmp_path / "p.csv")
        gd.write_csv(gfile)
        pd = PhenotypeData()
        pd.add_phenotype(1, "trait", gd.accessions, y)
        pd.add_phenotype(2, "env", gd.accessions, env)
        pd.write_to_file(pfile)

        from mixmogam_tpu.api import run_gwas

        out = run_gwas(gfile, pfile, pid=1, method="emmax_gxe", env_pid=2,
                       min_mac=3, out_prefix=str(tmp_path / "gxe"),
                       plots=False)
        ps = out["scan"]["inter_ps"]
        # SNP 7 carries the planted interaction; min_mac may drop rows
        # before it, so find it by position
        j = int(np.where(out["genotype"].positions == 700)[0][0])
        assert int(np.argmin(ps)) == j
        assert (np.asarray(out["result"].scores) == ps).all()
        assert "marginal_ps" in out["scan"] and "joint_ps" in out["scan"]

        rc = main(["run", gfile, pfile, "--method", "emmax_gxe",
                   "--env-pid", "2", "--min-mac", "3", "--no-plots",
                   "-o", str(tmp_path / "cli_gxe")])
        assert rc == 0
        assert "min p" in capsys.readouterr().out
        with open(tmp_path / "cli_gxe.summary.json") as f:
            s = json.load(f)
        assert s["method"] == "emmax_gxe"

    def test_env_pid_required(self, tmp_path):
        import pytest

        from mixmogam_tpu.api import run_gwas
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.phenotype import PhenotypeData

        G, y, env, K = _data(n=60, m=40, seed=3)
        gd = GenotypeData(G, np.repeat(1, 40), np.arange(40) * 10,
                          [f"s{i}" for i in range(60)])
        gfile = str(tmp_path / "g.csv")
        pfile = str(tmp_path / "p.csv")
        gd.write_csv(gfile)
        pd = PhenotypeData()
        pd.add_phenotype(1, "trait", gd.accessions, y)
        pd.write_to_file(pfile)
        with pytest.raises(ValueError, match="env_pid"):
            run_gwas(gfile, pfile, pid=1, method="emmax_gxe", plots=False)


class TestGxeResident:
    def test_resident_matches_incore(self):
        """ResidentGenome path == in-core path (same fitted null, same
        F's) — including a missing-genotype genome (device impute)."""
        from mixmogam_tpu.models.resident import ResidentGenome

        G, y, env, K = _data(n=64, m=96, seed=15)
        ref = emmax_gxe(G, y, env, K=K)
        rg = ResidentGenome.from_source(G, tile=32)
        res = emmax_gxe(rg, y, env, K=K)
        for k in ("marginal_ps", "inter_ps", "joint_ps"):
            np.testing.assert_allclose(res[k], ref[k], atol=1e-10)
        np.testing.assert_array_equal(res["mask_inter"],
                                      ref["mask_inter"])
        # missing genotypes: device impute == host mean-impute
        Gm = G.copy()
        Gm[np.random.default_rng(1).random(G.shape) < 0.05] = -1
        ref_m = emmax_gxe(Gm, y, env, K=K)
        rg_m = ResidentGenome.from_source(Gm, tile=32)
        res_m = emmax_gxe(rg_m, y, env, K=K)
        np.testing.assert_allclose(res_m["inter_ps"], ref_m["inter_ps"],
                                   atol=1e-10)

    def test_sample_mismatch_raises(self):
        import pytest

        from mixmogam_tpu.models.resident import ResidentGenome

        G, y, env, K = _data(n=64, m=96, seed=15)
        rg = ResidentGenome.from_source(G, tile=32)
        with pytest.raises(ValueError, match="samples"):
            emmax_gxe(rg, y[:-2], env[:-2], K=K[:-2, :-2])


class TestGxeRound4:
    """VERDICT r3 #3: precision tiers + multi-environment batch."""

    def test_multi_env_matches_single(self):
        """(n, E) input == E independent single-env runs (per-env null
        fits are independent; the shared rotation is exact algebra)."""
        G, y, env, K = _data(n=96, m=150, seed=21)
        rng = np.random.default_rng(21)
        env2 = np.column_stack([env, (rng.normal(size=96) > 0) * 1.0,
                                rng.normal(size=96)])
        res = emmax_gxe(G, y, env2, K=K)
        assert res["inter_ps"].shape == (3, 150)
        assert res["deltas"].shape == (3,)
        for e in range(3):
            ref = emmax_gxe(G, y, env2[:, e], K=K)
            np.testing.assert_allclose(res["inter_ps"][e],
                                       ref["inter_ps"], atol=1e-10)
            np.testing.assert_allclose(res["marginal_ps"][e],
                                       ref["marginal_ps"], atol=1e-10)
            np.testing.assert_allclose(res["joint_ps"][e],
                                       ref["joint_ps"], atol=1e-10)
            assert res["deltas"][e] == pytest.approx(ref["delta"])

    def test_multi_env_resident(self):
        from mixmogam_tpu.models.resident import ResidentGenome

        G, y, env, K = _data(n=64, m=96, seed=22)
        rng = np.random.default_rng(22)
        env2 = np.column_stack([env, rng.normal(size=64)])
        ref = emmax_gxe(G, y, env2, K=K)
        rg = ResidentGenome.from_source(G, tile=32)
        res = emmax_gxe(rg, y, env2, K=K)
        for k in ("marginal_ps", "inter_ps", "joint_ps"):
            np.testing.assert_allclose(res[k], ref[k], atol=1e-10)

    def test_tier_parity_int8(self):
        """int8x3 digit planes on BOTH rotations: fp32-grade parity on
        the x64 CPU path (exact quantization of env∘U to 22 bits below
        per-column max -> tiny, bounded drift)."""
        from mixmogam_tpu.models.resident import ResidentGenome

        G, y, env, K = _data(n=64, m=120, seed=23)
        rg = ResidentGenome.from_source(G, tile=32)
        ref = emmax_gxe(rg, y, env, K=K)
        res = emmax_gxe(rg, y, env, K=K, precision="int8x3")
        assert res["precision_tier"] == "int8x3"
        keep = ref["mask_inter"] & res["mask_inter"]
        np.testing.assert_allclose(res["inter_ps"][keep],
                                   ref["inter_ps"][keep], atol=2e-5)
        # leaders preserved
        assert int(np.argmin(res["inter_ps"])) == \
            int(np.argmin(ref["inter_ps"]))

    def test_tier_refuses_missing(self):
        from mixmogam_tpu.models.resident import ResidentGenome

        G, y, env, K = _data(n=64, m=96, seed=24)
        Gm = G.copy()
        Gm[0, :5] = -1
        rg = ResidentGenome.from_source(Gm, tile=32)
        with pytest.raises(ValueError, match="int8"):
            emmax_gxe(rg, y, env, K=K, precision="int8x2")

    def test_fast_rescore_exact_grade(self):
        """precision='fast' (int8x2 + exact rescore): the rescored
        leading interaction hits carry EXACT-grade p-values."""
        from mixmogam_tpu.models.resident import ResidentGenome

        G, y, env, K = _data(n=64, m=120, seed=25)
        rg = ResidentGenome.from_source(G, tile=32)
        ref = emmax_gxe(rg, y, env, K=K)
        res = emmax_gxe(rg, y, env, K=K, precision="int8x2",
                        rescore_top=20)
        idx = res["rescored_idx"]
        assert len(idx) >= 20
        np.testing.assert_allclose(res["inter_ps"][idx],
                                   ref["inter_ps"][idx], rtol=1e-6)
        np.testing.assert_allclose(res["marginal_ps"][idx],
                                   ref["marginal_ps"][idx], rtol=1e-6)

    def test_bf16x3_tier_incore(self):
        G, y, env, K = _data(n=80, m=100, seed=26)
        ref = emmax_gxe(G, y, env, K=K)
        res = emmax_gxe(G, y, env, K=K, precision="bf16x3")
        keep = ref["mask_inter"] & res["mask_inter"]
        np.testing.assert_allclose(res["inter_ps"][keep],
                                   ref["inter_ps"][keep], atol=5e-4)
