"""Parser robustness fuzzing: arbitrary junk fed to the CSV/VCF
readers (including the C++ fast paths) must either parse, fall back,
or raise a clean Python exception — never crash the process or return
silently-wrong shapes. The native paths are exercised in-process, so a
memory-safety bug here would take pytest down with it."""

import gzip

import numpy as np
import pytest

from mixmogam_tpu.data.parsers import parse_snp_data
from mixmogam_tpu.data.vcf import read_vcf

JUNK = [
    b"",
    b"\n\n\n",
    b"\x00\x01\x02\xff" * 64,
    b"Chromosome,Position\n",                       # header, no samples
    b"Chromosome,Position,a\n1,2\n",                # short row
    b"Chromosome,Position,a\n1,2,notanumber\n",
    b"Chromosome,Position,a\nX,2,1\n",              # non-numeric chrom
    b"Chromosome,Position,a\n1,2,999\n",            # int8 overflow
    b"a,b,c\n" + b"1,2,3\n" * 100,
    "Chromosome,Position,a\n1,2,é\n".encode(),  # non-ascii token
]

VCF_JUNK = [
    b"",
    b"##fileformat=VCFv4.2\n",
    b"1\t10\t.\tA\tG\t.\t.\t.\tGT\t0/0\n",          # data before header
    b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    b"1\t10\t.\tA\tG\n",                            # truncated record
    b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    b"notanint\tnotanint\t.\tA\tG\t.\t.\t.\tGT\t0/0\n",
    b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    b"1\t10\t.\tA\tG\t.\t.\t.\tGT\t0/0\textra\tcols\n",
    b"##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    + b"\xff\xfe junk \x00\n",
    b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    b"this_chromosome_name_is_far_too_long_for_the_native_buffer\t10\t."
    b"\tA\tG\t.\t.\t.\tGT\t1/1\n",
]


class TestCsvFuzz:
    @pytest.mark.parametrize("payload", JUNK, ids=range(len(JUNK)))
    def test_junk_csv_never_crashes(self, tmp_path, payload):
        p = str(tmp_path / "junk.csv")
        with open(p, "wb") as f:
            f.write(payload)
        try:
            gd = parse_snp_data(p)
        except (ValueError, OverflowError, UnicodeDecodeError):
            return  # clean refusal is fine
        # if it parsed, the container must be self-consistent
        assert gd.matrix.shape == (len(gd.chromosomes),
                                   len(gd.accessions))


class TestVcfFuzz:
    @pytest.mark.parametrize("payload", VCF_JUNK, ids=range(len(VCF_JUNK)))
    def test_junk_vcf_never_crashes(self, tmp_path, payload):
        p = str(tmp_path / "junk.vcf")
        with open(p, "wb") as f:
            f.write(payload)
        try:
            gd = read_vcf(p)
        except (ValueError, UnicodeDecodeError):
            return
        assert gd.matrix.shape == (len(gd.chromosomes),
                                   len(gd.accessions))

    def test_long_chrom_native_python_agree(self, tmp_path):
        """The >15-char chromosome case falls back to Python; the
        result must match the gzip (pure-Python) parse exactly."""
        body = VCF_JUNK[-1]
        p = str(tmp_path / "long.vcf")
        pgz = str(tmp_path / "long.vcf.gz")
        with open(p, "wb") as f:
            f.write(body)
        with gzip.open(pgz, "wb") as f:
            f.write(body)
        a = read_vcf(p)
        b = read_vcf(pgz)
        np.testing.assert_array_equal(a.matrix, b.matrix)
        np.testing.assert_array_equal(a.chromosomes, b.chromosomes)

    def test_random_mutations_of_valid_vcf(self, tmp_path):
        """Byte-level mutations of a valid file: every outcome must be
        a parse, a fallback, or a clean error."""
        base = (b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                b"\ts0\ts1\n"
                + b"".join(b"%d\t%d\t.\tA\tG\t.\t.\t.\tGT\t0/1\t1/1\n"
                           % (1 + j % 3, 10 * j + 1) for j in range(40)))
        rng = np.random.default_rng(0)
        for trial in range(25):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                pos = int(rng.integers(len(buf)))
                buf[pos] = int(rng.integers(256))
            p = str(tmp_path / f"mut{trial}.vcf")
            with open(p, "wb") as f:
                f.write(bytes(buf))
            try:
                gd = read_vcf(p)
            except (ValueError, UnicodeDecodeError, KeyError):
                continue
            assert gd.matrix.shape == (len(gd.chromosomes),
                                       len(gd.accessions))
            assert gd.matrix.min(initial=0) >= -1
