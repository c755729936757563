"""PLINK .bed/.bim/.fam input (data/plink.py) — round-3 capability
extension (the reference reads only CSV/HDF5; real cohorts ship PLINK).

The .bed payload is 2-bit SNP-major like this package's container, so
the loader is a byte-LUT remap; these tests pin the code mapping
(00=hom A1 -> 2, 01=missing -> -1, 10=het -> 1, 11=hom A2 -> 0),
the lazy source protocol, and the zero-decode resident upload.
"""

import numpy as np
import pytest

from mixmogam_tpu.data.plink import (PlinkBedSource, read_plink,
                                     resident_from_plink)

BED_CODE = {2: 0b00, -1: 0b01, 1: 0b10, 0: 0b11}  # dosage -> bed bits


def write_plink(prefix, G, chroms=None, poss=None):
    """Tiny PLINK writer for tests: G (M, n) int8 dosages of A1."""
    M, n = G.shape
    rb = (n + 3) // 4
    payload = np.zeros((M, rb), dtype=np.uint8)
    for j in range(M):
        for i in range(n):
            payload[j, i // 4] |= BED_CODE[int(G[j, i])] << (2 * (i % 4))
    with open(prefix + ".bed", "wb") as f:
        f.write(b"\x6c\x1b\x01" + payload.tobytes())
    with open(prefix + ".fam", "w") as f:
        for i in range(n):
            f.write(f"fam{i} iid{i} 0 0 0 -9\n")
    with open(prefix + ".bim", "w") as f:
        for j in range(M):
            c = 1 if chroms is None else chroms[j]
            p = (j + 1) * 100 if poss is None else poss[j]
            f.write(f"{c} snp{j} 0 {p} A G\n")


def _sim(seed=0, m=60, n=21, missing=0.1):
    rng = np.random.default_rng(seed)
    G = rng.integers(0, 3, (m, n)).astype(np.int8)
    if missing:
        G[rng.random((m, n)) < missing] = -1
    return G


class TestPlinkRead:
    def test_roundtrip(self, tmp_path):
        G = _sim()
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        gd = read_plink(prefix)
        np.testing.assert_array_equal(gd.matrix, G)
        assert gd.num_samples == 21 and gd.num_snps == 60
        assert gd.accessions[0] == "iid0"

    def test_lazy_source_slicing(self, tmp_path):
        G = _sim(1, n=24)  # n % 4 == 0 path
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        src, chroms, poss, ids = read_plink(prefix, lazy=True)
        assert isinstance(src, PlinkBedSource)
        np.testing.assert_array_equal(src[10:20], G[10:20])
        np.testing.assert_array_equal(src[np.array([3, 17, 59])],
                                      G[[3, 17, 59]])
        assert poss[1] == 200 and len(ids) == 24

    def test_sample_major_rejected(self, tmp_path):
        G = _sim(2, m=4, n=4, missing=0)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        raw = open(prefix + ".bed", "rb").read()
        with open(prefix + ".bed", "wb") as f:
            f.write(raw[:2] + b"\x00" + raw[3:])
        with pytest.raises(ValueError, match="sample-major"):
            read_plink(prefix)

    def test_size_mismatch_rejected(self, tmp_path):
        G = _sim(3, m=4, n=4, missing=0)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        with open(prefix + ".bed", "ab") as f:
            f.write(b"\x00")
        with pytest.raises(ValueError, match="size"):
            read_plink(prefix)

    def test_emmax_from_plink(self, tmp_path):
        """End-to-end: PLINK fileset -> GWAS."""
        from mixmogam_tpu.models.emmax import emmax
        from mixmogam_tpu.ops.kinship import kinship
        from mixmogam_tpu.oracle.kinship import scale_k

        rng = np.random.default_rng(4)
        G = _sim(4, m=300, n=64, missing=0)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        gd = read_plink(prefix)
        y = G[7].astype(float) + rng.normal(size=64) * 0.5
        K = scale_k(kinship(gd))
        res = emmax(gd, y, K=K)
        assert int(np.argmin(res["ps"])) == 7


class TestPlinkResident:
    def test_zero_decode_resident_parity(self, tmp_path):
        from mixmogam_tpu.models.resident import emmax_resident
        from mixmogam_tpu.ops.kinship import kinship
        from mixmogam_tpu.oracle.kinship import scale_k

        rng = np.random.default_rng(5)
        G = _sim(5, m=128, n=30, missing=0.05)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        rg, chroms, poss, ids = resident_from_plink(prefix, tile=32)
        assert rg.has_missing and rg.shape == (128, 30)
        np.testing.assert_array_equal(rg[0:128], G)
        # full pipeline off the bed-sourced container
        Gf = G.astype(np.float64)
        Gf[G < 0] = np.nan
        mu = np.nanmean(Gf, axis=1)
        imp = np.where(np.isnan(Gf), mu[:, None], Gf)
        y = imp[3] + rng.normal(size=30) * 0.5
        K = scale_k(kinship(rg, method="ibs", ploidy=2,
                            dtype=np.float64))
        K_ref = scale_k(kinship(G, method="ibs", ploidy=2,
                                dtype=np.float64))
        np.testing.assert_allclose(K, K_ref, atol=1e-9)
        res = emmax_resident(rg, y, K=K)
        assert res["ps"].shape == (128,)


class TestReviewFixes:
    """Regressions for the round-3 code-review findings."""

    def test_read_plink_is_diploid(self, tmp_path):
        """Finding 1: a bed with dosage-2 calls must come back ploidy=2
        (kinship/MAF formulas) — and even a bed with NO hom-minor calls
        is still diploid by format definition."""
        from mixmogam_tpu.ops.kinship import kinship

        G = _sim(10, m=50, n=12, missing=0)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        gd = read_plink(prefix)
        assert gd.ploidy == 2
        K = kinship(gd, dtype=np.float64)
        assert np.all(np.diag(K) <= 1.0 + 1e-12)  # sharing fractions
        G01 = np.clip(G, -1, 1)                   # no hom-minor calls
        write_plink(prefix, G01)
        assert read_plink(prefix).ploidy == 2

    def test_lazy_source_asarray_and_scalar_row(self, tmp_path):
        """Finding 2: np.asarray(src) must be (M, n); src[int] -> (n,)."""
        G = _sim(11, m=20, n=10)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        src, *_ = read_plink(prefix, lazy=True)
        np.testing.assert_array_equal(np.asarray(src), G)
        np.testing.assert_array_equal(src[7], G[7])
        # in-core emmax over the lazy source works now
        from mixmogam_tpu.models.emmax import emmax

        y = G[0].astype(float) + 0.1 * np.arange(10)
        res = emmax(src, y, K=np.eye(10) + 0.01, stream=False)
        assert res["ps"].shape == (20,)

    def test_bim_chr_prefix_and_contigs(self, tmp_path):
        """Finding 4: 'chr1' == 1; distinct contig names get DISTINCT
        codes (never a shared 0)."""
        G = _sim(12, m=4, n=8, missing=0)
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        with open(prefix + ".bim", "w") as f:
            f.write("chr1 a 0 100 A G\nchr2 b 0 100 A G\n"
                    "scaffold_9 c 0 100 A G\nscaffold_12 d 0 100 A G\n")
        gd = read_plink(prefix)
        assert gd.chromosomes[0] == 1 and gd.chromosomes[1] == 2
        assert gd.chromosomes[2] != gd.chromosomes[3]
        assert gd.chromosomes[2] >= 27

    def test_resident_missing_detection_packed(self, tmp_path):
        """Finding 5: missing detection without decode — including a
        missing call in the TAIL byte's valid slots (n % 4 != 0)."""
        G = _sim(13, m=8, n=10, missing=0)
        G[3, 9] = -1   # slot 1 of the tail byte
        prefix = str(tmp_path / "toy")
        write_plink(prefix, G)
        rg, *_ = resident_from_plink(prefix, tile=8)
        assert rg.has_missing
        G[3, 9] = 0
        write_plink(prefix, G)
        rg2, *_ = resident_from_plink(prefix, tile=8)
        assert not rg2.has_missing


class TestPlinkWriter:
    def test_roundtrip_write_read(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.plink import write_plink as pkg_write_plink

        G = _sim(20, m=37, n=11, missing=0.1)   # n % 4 == 3 (tail byte)
        gd = GenotypeData(G, np.ones(37, dtype=np.int32),
                          np.arange(37) * 50, [f"s{i}" for i in range(11)],
                          ploidy=2)
        prefix = str(tmp_path / "out")
        pkg_write_plink(prefix, gd)
        back = read_plink(prefix)
        np.testing.assert_array_equal(back.matrix, G)
        assert back.accessions == gd.accessions
        np.testing.assert_array_equal(back.positions, gd.positions)
        # tail slots are PLINK 0-bits, not our code 3
        with open(prefix + ".bed", "rb") as f:
            payload = np.frombuffer(f.read()[3:], np.uint8).reshape(37, 3)
        assert not (payload[:, -1] >> 6).any()
