"""Native C++ data plane + streaming scan + checkpoint/resume tests."""

import os

import numpy as np
import pytest

from mixmogam_tpu import native
from mixmogam_tpu.data.genotype import GenotypeData
from mixmogam_tpu.data.parsers import parse_snp_data
from mixmogam_tpu.data.simulate import simulate_genotypes
from mixmogam_tpu.models import emmax
from mixmogam_tpu.models.streaming import emmax_streamed


@pytest.fixture(scope="module")
def gd_missing(tmp_path_factory):
    G, ch, po = simulate_genotypes(60, 500, missing_rate=0.04, seed=9)
    return GenotypeData(G, ch, po, [f"s{i}" for i in range(60)])


class TestNativeParser:
    def test_parse_matches_python(self, gd_missing, tmp_path):
        if not native.available():
            pytest.skip("no C++ toolchain")
        p = str(tmp_path / "g.csv")
        gd_missing.write_csv(p)
        gd_native = parse_snp_data(p)  # routes through native
        import mixmogam_tpu.data.parsers as pm

        orig = pm._try_native_dosage
        pm._try_native_dosage = lambda p: None
        try:
            gd_py = parse_snp_data(p)
        finally:
            pm._try_native_dosage = orig
        np.testing.assert_array_equal(gd_native.matrix, gd_py.matrix)
        np.testing.assert_array_equal(gd_native.positions, gd_py.positions)
        assert gd_native.accessions == gd_py.accessions

    def test_pack_roundtrip_and_fallback_parity(self, gd_missing):
        pk = native.pack_2bit(gd_missing.matrix)
        un = native.unpack_2bit(pk, gd_missing.num_samples)
        np.testing.assert_array_equal(un, gd_missing.matrix)
        # numpy fallback produces identical bytes
        import mixmogam_tpu.native as nat

        lib, tried = nat._lib, nat._tried
        nat._lib, nat._tried = None, True
        try:
            pk2 = native.pack_2bit(gd_missing.matrix)
            un2 = native.unpack_2bit(pk2, gd_missing.num_samples)
        finally:
            nat._lib, nat._tried = lib, tried
        np.testing.assert_array_equal(pk2, pk)
        np.testing.assert_array_equal(un2, gd_missing.matrix)

    def test_packed_container(self, gd_missing, tmp_path):
        p = str(tmp_path / "g.packed.npz")
        gd_missing.write_packed(p)
        gd2 = GenotypeData.read_packed(p)
        np.testing.assert_array_equal(gd2.matrix, gd_missing.matrix)
        assert gd2.accessions == gd_missing.accessions
        assert os.path.getsize(p) < gd_missing.matrix.nbytes


class TestStreaming:
    def test_streamed_matches_emmax(self, small_dataset, kinship_small):
        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        ref = emmax(G_int, y, K=K, dtype=np.float32)
        st = emmax_streamed(G_int, y, K=K, tile=64)
        lp_r = -np.log10(np.maximum(ref["ps"], 1e-300))
        lp_s = -np.log10(np.maximum(st["ps"], 1e-300))
        assert np.max(np.abs(lp_r - lp_s)) < 1e-3  # f32 impute vs f32 path
        np.testing.assert_array_equal(ref["mask"], st["mask"])

    def test_streamed_int8_tier(self, small_dataset, kinship_small):
        """int8x3 digit-plane tier through the streaming path: fp32-grade
        vs the streamed exact tier on a fully-observed source."""
        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        ref = emmax_streamed(G_int, y, K=K, tile=64)
        st = emmax_streamed(G_int, y, K=K, tile=64,
                            rotate_in_bf16="int8x3")
        assert np.max(np.abs(ref["ps"] - st["ps"])) < 2e-6
        np.testing.assert_array_equal(ref["mask"], st["mask"])

    def test_streamed_int8_tier_refuses_missing(self, gd_missing,
                                                kinship_small):
        rng = np.random.default_rng(0)
        y = rng.normal(size=gd_missing.num_samples)
        K = np.eye(gd_missing.num_samples)
        with pytest.raises(ValueError, match="fully-observed"):
            emmax_streamed(gd_missing.matrix, y, K=K, tile=128,
                           rotate_in_bf16="int8x3")

    def test_streamed_with_missing(self, gd_missing, kinship_small):
        rng = np.random.default_rng(0)
        y = rng.normal(size=gd_missing.num_samples)
        K = np.eye(gd_missing.num_samples)
        st = emmax_streamed(gd_missing.matrix, y, K=K, tile=128)
        ref = emmax(gd_missing, y, K=K, dtype=np.float32)
        lp_r = -np.log10(np.maximum(ref["ps"], 1e-300))
        lp_s = -np.log10(np.maximum(st["ps"], 1e-300))
        assert np.max(np.abs(lp_r - lp_s)) < 1e-2

    def test_checkpoint_resume(self, small_dataset, kinship_small, tmp_path):
        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        ck = str(tmp_path / "ck")
        full = emmax_streamed(G_int, y, K=K, tile=64, checkpoint_dir=ck)
        # tamper: drop some tiles from the manifest -> partial resume
        import glob
        import json

        mpath = glob.glob(os.path.join(ck, "manifest_*.json"))[0]
        with open(mpath) as f:
            man = json.load(f)
        man["done"] = man["done"][:3]
        with open(mpath, "w") as f:
            json.dump(man, f)
        resumed = emmax_streamed(G_int, y, K=K, tile=64, checkpoint_dir=ck)
        np.testing.assert_allclose(resumed["ps"], full["ps"], atol=1e-12)

    def test_h5py_source(self, small_dataset, kinship_small, tmp_path):
        """Out-of-core source: an h5py dataset streams directly."""
        import h5py

        G_int = small_dataset["G_int"]
        p = str(tmp_path / "g.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("m", data=G_int, chunks=(64, G_int.shape[1]))
        y, K = small_dataset["y"], kinship_small
        with h5py.File(p, "r") as f:
            st = emmax_streamed(f["m"], y, K=K, tile=64)
        ref = emmax_streamed(G_int, y, K=K, tile=64)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-12)
