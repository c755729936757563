"""Regression tests for the round-5 ADVICE fixes (ADVICE.md r4)."""

import numpy as np
import pytest

from mixmogam_tpu.data.vcf import read_vcf


def _write_vcf(tmp_path, body, n_samples=3, name="t.vcf"):
    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
              + "\t".join(f"s{i}" for i in range(n_samples)) + "\n")
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(header + body)
    return p


class TestDsPloidyOverride:
    """ADVICE r4 #1: a diploid dosage VCF whose dosages are all <= 1
    was classified haploid by the range heuristic, and parse_snp_data's
    ploidy kwarg was dropped on the vcf_ds branch."""

    BODY = ("1\t100\t.\tA\tG\t.\t.\t.\tDS\t0.1\t0.9\t0.4\n"
            "1\t200\t.\tC\tT\t.\t.\t.\tDS\t0.2\t0.0\t0.8\n")

    def test_heuristic_default_unchanged(self, tmp_path):
        gd = read_vcf(_write_vcf(tmp_path, self.BODY), field="DS")
        assert gd.ploidy == 1  # the documented fallback heuristic

    def test_explicit_ploidy_wins(self, tmp_path):
        gd = read_vcf(_write_vcf(tmp_path, self.BODY), field="DS",
                      ploidy=2)
        assert gd.ploidy == 2
        # allele counts double with the diploid denominator
        assert gd.matrix.shape == (2, 3)

    def test_explicit_ploidy_validated(self, tmp_path):
        body = "1\t100\t.\tA\tG\t.\t.\t.\tDS\t0.1\t1.9\t0.4\n"
        with pytest.raises(ValueError, match="ploidy=1 conflicts"):
            read_vcf(_write_vcf(tmp_path, body), field="DS", ploidy=1)

    def test_parse_snp_data_threads_ploidy(self, tmp_path):
        from mixmogam_tpu.data.parsers import parse_snp_data

        p = _write_vcf(tmp_path, self.BODY)
        gd = parse_snp_data(p, data_format="vcf_ds", ploidy=2)
        assert gd.ploidy == 2

    def test_allele_counts_use_overridden_ploidy(self, tmp_path):
        gd2 = read_vcf(_write_vcf(tmp_path, self.BODY), field="DS",
                       ploidy=2)
        alt = gd2.matrix.sum(axis=1)
        tot = gd2.matrix.shape[1] * 2  # diploid denominator
        expect = np.minimum(alt, tot - alt) / tot
        np.testing.assert_allclose(gd2.get_mafs(), expect, atol=1e-6)


class TestPermPrecisionConsistency:
    """ADVICE r4 #4: emmax_perm_test rejected EVERY precision value on
    the host-tile path, including the valid no-op tiers."""

    def setup_method(self):
        rng = np.random.default_rng(7)
        self.n, self.M = 32, 80
        self.G = (rng.random((self.M, self.n)) < 0.4).astype(np.int8)
        self.y = self.G[3].astype(float) + rng.normal(size=self.n) * 0.5
        from mixmogam_tpu.oracle.kinship import ibs_kinship, scale_k

        self.K = scale_k(ibs_kinship(self.G.astype(np.float64)))

    def test_exact_and_auto_accepted(self):
        from mixmogam_tpu.models.permutation import emmax_perm_test

        base = emmax_perm_test(self.G, self.y, K=self.K, num_perm=8,
                               seed=2, tile=32)
        for prec in ("exact", "auto"):
            r = emmax_perm_test(self.G, self.y, K=self.K, num_perm=8,
                                seed=2, tile=32, precision=prec)
            np.testing.assert_allclose(r["min_ps"], base["min_ps"],
                                       rtol=1e-12)

    def test_tiered_names_still_rejected(self):
        from mixmogam_tpu.models.permutation import emmax_perm_test

        with pytest.raises(ValueError, match="ResidentGenome"):
            emmax_perm_test(self.G, self.y, K=self.K, num_perm=4,
                            tile=32, precision="int8x2")
