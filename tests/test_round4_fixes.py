"""Regression tests for round-4 ADVICE/VERDICT fixes.

- api.run_gwas: covariates + GxE with incomplete env coverage must
  coordinate the sample drop BEFORE building/storing X0 (ADVICE r3
  medium: stale-row X0 made the combination unusable).
- data.vcf.write_vcf: generic GT codes for ploidy > 2 (ADVICE r3 low).
- models.gblup: unknown kinship_method raises instead of silently
  coercing to IBS (ADVICE r3 low).
"""

import numpy as np
import pytest

from mixmogam_tpu.data.genotype import GenotypeData
from mixmogam_tpu.data.phenotype import PhenotypeData
from mixmogam_tpu.data.simulate import simulate_genotypes, simulate_phenotype


def _files(tmp_path, n=80, m=60, seed=11, env_holes=(), cov_holes=()):
    """Genotype CSV + phenotype file with trait (pid 1), env (pid 2) and
    a covariate (pid 3); env/cov values withheld for the given sample
    indices."""
    G, ch, po = simulate_genotypes(n, m, seed=seed)
    rng = np.random.default_rng(seed)
    env = rng.normal(size=n)
    cov = rng.normal(size=n)
    y, _ = simulate_phenotype(G, h2=0.5, n_causal=5, seed=seed)
    y = y + 1.2 * G[7].astype(float) * env
    accs = [f"s{i}" for i in range(n)]
    gd = GenotypeData(G, ch, po, accs)
    gfile = str(tmp_path / "g.csv")
    pfile = str(tmp_path / "p.csv")
    gd.write_csv(gfile)
    pd = PhenotypeData()
    pd.add_phenotype(1, "trait", accs, y)
    keep_e = [i for i in range(n) if i not in set(env_holes)]
    pd.add_phenotype(2, "env", [accs[i] for i in keep_e], env[keep_e])
    keep_c = [i for i in range(n) if i not in set(cov_holes)]
    pd.add_phenotype(3, "cov", [accs[i] for i in keep_c], cov[keep_c])
    pd.write_to_file(pfile)
    return gfile, pfile


class TestGxeCovariateCoordination:
    def test_covariates_with_incomplete_env(self, tmp_path):
        """ADVICE r3 medium: env holes shrink the sample set AFTER X0
        was built -> stale-row design error. Fixed: one coordinated
        drop over covariates AND env before any design is built."""
        from mixmogam_tpu.api import run_gwas

        gfile, pfile = _files(tmp_path, env_holes=(3, 17, 41))
        out = run_gwas(gfile, pfile, pid=1, method="emmax_gxe", env_pid=2,
                       covariate_pids=[3], min_mac=2, plots=False)
        assert out["genotype"].num_samples == 77
        assert np.isfinite(out["scan"]["inter_ps"]).all()

    def test_covariates_and_env_holes_intersect(self, tmp_path):
        from mixmogam_tpu.api import run_gwas

        gfile, pfile = _files(tmp_path, env_holes=(3, 17), cov_holes=(17, 60))
        out = run_gwas(gfile, pfile, pid=1, method="emmax_gxe", env_pid=2,
                       covariate_pids=[3], min_mac=2, plots=False)
        # union of holes = {3, 17, 60}
        assert out["genotype"].num_samples == 77

    def test_explicit_x0_resliced(self, tmp_path):
        """A user-supplied X0 built on the pre-drop coordinated set is
        row-subset along with the samples."""
        from mixmogam_tpu.api import run_gwas

        gfile, pfile = _files(tmp_path, env_holes=(5,))
        rng = np.random.default_rng(0)
        X0 = np.column_stack([np.ones(80), rng.normal(size=80)])
        out = run_gwas(gfile, pfile, pid=1, method="emmax_gxe", env_pid=2,
                       min_mac=2, plots=False, X0=X0)
        assert out["genotype"].num_samples == 79


class TestWriteVcfPloidy:
    def test_tetraploid_round_trip(self, tmp_path):
        from mixmogam_tpu.data.vcf import read_vcf, write_vcf

        rng = np.random.default_rng(4)
        M, n = 12, 9
        mat = rng.integers(0, 5, size=(M, n)).astype(np.int8)
        mat[2, 3] = -1
        gd = GenotypeData(mat, np.repeat(1, M), np.arange(M) * 50 + 1,
                          [f"a{i}" for i in range(n)], ploidy=4)
        path = str(tmp_path / "tetra.vcf")
        write_vcf(gd, path)
        back = read_vcf(path)
        assert back.ploidy == 4
        np.testing.assert_array_equal(back.matrix, mat)
        with open(path) as f:
            body = [ln for ln in f if not ln.startswith("#")]
        assert "0/1/1/1" in body[0] or any("0/1/1/1" in ln for ln in body)

    def test_haploid_codes_unchanged(self, tmp_path):
        from mixmogam_tpu.data.vcf import read_vcf, write_vcf

        mat = np.array([[0, 1, -1], [1, 0, 1]], dtype=np.int8)
        gd = GenotypeData(mat, np.repeat(1, 2), np.array([10, 20]),
                          ["x", "y", "z"], ploidy=1)
        path = str(tmp_path / "hap.vcf")
        write_vcf(gd, path)
        with open(path) as f:
            lines = [ln.rstrip("\n") for ln in f if not ln.startswith("#")]
        assert lines[0].split("\t")[9:] == ["0", "1", "."]
        back = read_vcf(path)
        np.testing.assert_array_equal(back.matrix, mat)


class TestGblupKinshipValidation:
    def test_typo_raises(self):
        from mixmogam_tpu.models.gblup import gblup_cv

        G, _, _ = simulate_genotypes(40, 30, seed=1)
        y, _ = simulate_phenotype(G, h2=0.5, n_causal=3, seed=1)
        with pytest.raises(ValueError, match="kinship method"):
            gblup_cv(G, y, n_folds=2, kinship_method="vanRaden")
