"""Round-2 fixes: diploid nucleotide parsing (VERDICT #9), ploidy
forwarding for HDF5/nucleotide inputs (ADVICE), long-string result output
(ADVICE), wide-int missing sentinels in kinship (ADVICE)."""

import numpy as np
import pytest

from mixmogam_tpu.data.parsers import parse_snp_data


class TestDiploidNucleotides:
    def test_two_letter_calls(self, tmp_path):
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c,d\n"
                     "1,100,AA,AT,TT,AA\n"
                     "1,200,CC,CG,CC,NN\n")
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.ploidy == 2
        # row 1: A is major (5 copies), T minor (3) -> dosage = T copies
        assert gd.matrix[0].tolist() == [0, 1, 2, 0]
        assert gd.matrix[1].tolist() == [0, 1, 0, -1]
        assert gd.alleles[0].tolist() == ["A", "T"]

    def test_separators_and_iupac(self, tmp_path):
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c\n"
                     "1,100,A/A,A|T,T/T\n"
                     "1,200,G,R,A\n")  # R = A/G het (IUPAC)
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.ploidy == 2
        assert gd.matrix[0].tolist() == [0, 1, 2]
        # row 2: copies A=2(from R,A... wait) — A appears in R (1) and A
        # call; under diploid the single-letter 'A' is homozygous.
        # Copy ranking uses raw per-call copies: G: 1(G)+1(R)=2,
        # A: 1(R)+1(A)=2 -> tie broken alphabetically: major=A, minor=G.
        # dosages (G copies, x2 for single-letter calls): G->2, R->1, A->0
        assert gd.matrix[1].tolist() == [2, 1, 0]

    def test_retro_fix_haploid_prefix_rows(self, tmp_path):
        """Rows before the first diploid evidence are retro-coded 0/2."""
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c\n"
                     "1,100,A,T,A\n"      # parsed while file looks haploid
                     "1,200,AA,AT,TT\n")  # diploid evidence
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.ploidy == 2
        # haploid-coded row must become homozygous dosages 0/2
        assert gd.matrix[0].tolist() == [0, 2, 0]
        assert gd.matrix[1].tolist() == [0, 1, 2]

    def test_forced_haploid_hets_missing(self, tmp_path):
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c\n"
                     "1,100,AA,AT,TT\n")
        gd = parse_snp_data(str(p), data_format="nucleotides", ploidy=1)
        assert gd.ploidy == 1
        assert gd.matrix[0].tolist() == [0, -1, 1]

    def test_third_allele_missing(self, tmp_path):
        p = tmp_path / "nt.csv"
        # copies: A=5, T=2, G=1 -> major A, minor T; AG carries the 3rd
        # allele G -> missing
        p.write_text("Chromosome,Position,a,b,c,d\n"
                     "1,100,AA,AT,AT,AG\n")
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.matrix[0].tolist() == [0, 1, 1, -1]

    def test_haploid_file_unchanged(self, tmp_path):
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c,d\n"
                     "1,100,A,A,T,T\n")
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.ploidy == 1
        assert gd.matrix[0].tolist() == [0, 0, 1, 1]


class TestPloidyForwarding:
    def test_hdf5_ploidy_override(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData

        G = np.array([[0, 1, 0], [1, 0, 1]], dtype=np.int8)
        gd = GenotypeData(G, np.ones(2, np.int32),
                          np.array([10, 20]), ["a", "b", "c"], ploidy=1)
        p = tmp_path / "g.h5"
        gd.write_hdf5(str(p))
        gd2 = parse_snp_data(str(p), ploidy=2)
        assert gd2.ploidy == 2
        gd3 = parse_snp_data(str(p))
        assert gd3.ploidy == 1

    def test_hdf5_ploidy_conflict_raises(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData

        G = np.array([[0, 1, 2]], dtype=np.int8)
        gd = GenotypeData(G, np.ones(1, np.int32),
                          np.array([10]), ["a", "b", "c"], ploidy=2)
        p = tmp_path / "g.h5"
        gd.write_hdf5(str(p))
        with pytest.raises(ValueError, match="ploidy"):
            parse_snp_data(str(p), ploidy=1)


class TestResultLongStrings:
    def test_write_long_additional_strings(self, tmp_path):
        from mixmogam_tpu.results.result import Result

        names = np.array(["m" * 48, "short"], dtype=object)
        r = Result(np.array([1e-8, 1e-2]),
                   np.array([1, 1]), np.array([100, 200]),
                   additional={"marker": names}, score_type="pvals")
        p = tmp_path / "r.csv"
        r.write_to_file(str(p))
        text = p.read_text()
        assert "m" * 48 in text  # U32 cast used to truncate to 32 chars


class TestWideIntSentinels:
    def test_host_kinship_int64_missing(self):
        """int64 matrices with -1 sentinels get the same mean-imputation
        as int8 (used to silently skip imputation)."""
        from mixmogam_tpu.ops.kinship import kinship

        rng = np.random.default_rng(0)
        G8 = rng.integers(0, 2, size=(40, 12)).astype(np.int8)
        G8[rng.random(G8.shape) < 0.15] = -1
        K8 = kinship(G8, method="vanraden", use_device=False)
        K64 = kinship(G8.astype(np.int64), method="vanraden",
                      use_device=False)
        np.testing.assert_allclose(K8, K64, atol=1e-12)

    def test_distributed_kinship_int64_missing(self):
        from mixmogam_tpu.parallel.distributed import distributed_kinship
        from mixmogam_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(1)
        G = rng.integers(0, 2, size=(32, 10)).astype(np.int64)
        G[rng.random(G.shape) < 0.2] = -1
        mesh = make_mesh()
        Kd = distributed_kinship(G, mesh=mesh, method="vanraden")
        from mixmogam_tpu.ops.kinship import kinship

        Kh = kinship(G.astype(np.int8), method="vanraden",
                     use_device=False)
        np.testing.assert_allclose(Kd, Kh, atol=1e-8)
