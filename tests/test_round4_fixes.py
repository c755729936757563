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


class TestReviewR4Fixes:
    """Round-4 self-review findings (code-review pass)."""

    def test_loco_lazy_single_chromosome_raises(self):
        from mixmogam_tpu.models.loco import emmax_loco
        from mixmogam_tpu.models.resident import ResidentGenome

        rng = np.random.default_rng(0)
        G = rng.integers(0, 3, (100, 32)).astype(np.int8)
        rg = ResidentGenome.from_source(G, tile=32)
        y = rng.normal(size=32)
        with pytest.raises(ValueError, match="at least 2"):
            emmax_loco(rg, y, chromosomes=np.ones(100, dtype=np.int32))

    def test_ds_trailing_field_dropped(self, tmp_path):
        """VCF 4.x allows per-sample dropping of trailing FORMAT
        fields: a call missing DS records NaN, not IndexError."""
        from mixmogam_tpu.data.vcf import read_vcf

        body = ("##fileformat=VCFv4.2\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\ts0\ts1\ts2\n"
                "1\t100\t.\tA\tG\t.\t.\t.\tGT:DP:DS\t0/1:12:0.9\t"
                "0/1:12\t1/1:3:1.8\n")
        p = str(tmp_path / "drop.vcf")
        with open(p, "w") as f:
            f.write(body)
        gd = read_vcf(p, field="DS")
        np.testing.assert_allclose(gd.matrix[0, [0, 2]], [0.9, 1.8],
                                   rtol=1e-6)
        assert np.isnan(gd.matrix[0, 1])

    def test_truncated_gz_never_silently_truncates(self, tmp_path):
        """A corrupt/truncated .vcf.gz must raise (native returns -2 ->
        python gzip raises), never return fewer SNPs silently."""
        import gzip

        from mixmogam_tpu.data.vcf import read_vcf

        rows = "".join(f"1\t{j + 1}\t.\tA\tG\t.\t.\t.\tGT\t0/1\t1/1\n"
                       for j in range(500))
        full = ("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL"
                "\tFILTER\tINFO\tFORMAT\ts0\ts1\n" + rows)
        p = str(tmp_path / "t.vcf.gz")
        with gzip.open(p, "wt") as f:
            f.write(full)
        blob = open(p, "rb").read()
        with open(p, "wb") as f:
            f.write(blob[: len(blob) // 2])  # truncate mid-stream
        with pytest.raises(Exception):
            read_vcf(p)
