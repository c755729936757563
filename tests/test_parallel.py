"""Distributed tests on the 8-virtual-CPU-device mesh (SURVEY.md §4.3):
numerical invariance to mesh shape, psum kinship parity, graft entries."""

import importlib
import sys

import jax
import numpy as np
import pytest

from mixmogam_tpu import oracle
from mixmogam_tpu.models import emmax
from mixmogam_tpu.parallel.distributed import (distributed_emmax,
                                               distributed_kinship,
                                               distributed_train_step)
from mixmogam_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def meshes():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    return {
        "one": make_mesh((1, 1), devices=devs[:1]),
        "snp8": make_mesh((8, 1), devices=devs[:8]),
        "mix": make_mesh((4, 2), devices=devs[:8]),
    }


class TestDistributedKinship:
    def test_psum_matches_oracle(self, small_dataset, meshes):
        G = small_dataset["G"]
        Ko = oracle.ibs_kinship(G)
        for name, mesh in meshes.items():
            Kd = distributed_kinship(G, mesh=mesh, method="ibs")
            np.testing.assert_allclose(Kd, Ko, atol=1e-10,
                                       err_msg=f"mesh {name}")

    def test_vanraden_psum(self, small_dataset, meshes):
        G = small_dataset["G"]
        Ko = oracle.vanraden_kinship(G, ploidy=1)
        Kd = distributed_kinship(G, mesh=meshes["snp8"], method="vanraden")
        np.testing.assert_allclose(Kd, Ko, atol=1e-9)

    def test_uneven_shard_padding(self, meshes):
        """M not divisible by the shard count must still be exact."""
        rng = np.random.default_rng(0)
        G = (rng.random((101, 40)) < 0.5).astype(np.float64)
        Ko = oracle.ibs_kinship(G)
        Kd = distributed_kinship(G, mesh=meshes["snp8"], method="ibs")
        np.testing.assert_allclose(Kd, Ko, atol=1e-10)


class TestDistributedEmmax:
    def test_mesh_shape_invariance(self, small_dataset, kinship_small,
                                   meshes):
        """1 chip == 8 chips == 4x2 (SURVEY §4.3: the distributed test
        pyramid's core invariant)."""
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        ref = emmax(G, y, K=K)
        for name, mesh in meshes.items():
            d = distributed_emmax(G, y, K=K, mesh=mesh)
            np.testing.assert_allclose(d["ps"], ref["ps"], atol=1e-10,
                                       err_msg=f"mesh {name}")
            np.testing.assert_allclose(d["f_stats"], ref["f_stats"],
                                       rtol=1e-9, err_msg=f"mesh {name}")

    def test_precision_tier_on_mesh(self, small_dataset, kinship_small,
                                    meshes):
        """The split-W bf16x3 tier also runs sharded and stays close to
        the exact path (fp32-grade — CPU bf16 emulation is looser than
        the MXU, hence the modest tolerance)."""
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        ref = emmax(G, y, K=K)
        d = distributed_emmax(G, y, K=K, mesh=meshes["snp8"],
                              dtype=np.float32, rotate_in_bf16="x3")
        assert np.argmin(d["ps"]) == np.argmin(ref["ps"])
        assert np.max(np.abs(d["ps"] - ref["ps"])) < 1e-4

    def test_int8_digit_tier_on_mesh(self, small_dataset, kinship_small,
                                     meshes):
        """The int8 digit-plane tier ('int8x3', fp32-grade) also runs
        sharded: exact int32 accumulation is device-count invariant."""
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        ref = emmax(G, y, K=K)
        d = distributed_emmax(G, y, K=K, mesh=meshes["snp8"],
                              dtype=np.float32, rotate_in_bf16="int8x3")
        assert np.argmin(d["ps"]) == np.argmin(ref["ps"])
        assert np.max(np.abs(d["ps"] - ref["ps"])) < 1e-4

    def test_uneven_snp_count(self, small_dataset, kinship_small, meshes):
        G, y, K = small_dataset["G"][:37], small_dataset["y"], kinship_small
        ref = emmax(G, y, K=K)
        d = distributed_emmax(G, y, K=K, mesh=meshes["snp8"])
        assert d["ps"].shape == (37,)
        np.testing.assert_allclose(d["ps"], ref["ps"], atol=1e-10)


class TestTrainStep:
    def test_train_step_runs_and_is_mesh_invariant(self, meshes):
        rng = np.random.default_rng(5)
        n, M, T = 24, 48, 2
        G = (rng.random((M, n)) < 0.4).astype(np.float32)
        Y = rng.normal(size=(T, n)).astype(np.float32)
        outs = {}
        for name in ("one", "snp8", "mix"):
            outs[name] = distributed_train_step(meshes[name], G, Y, top_k=4)
        for name in ("snp8", "mix"):
            np.testing.assert_allclose(outs[name]["K"], outs["one"]["K"],
                                       atol=1e-5)
            np.testing.assert_allclose(outs[name]["top_f"],
                                       outs["one"]["top_f"], rtol=2e-4)
            np.testing.assert_array_equal(outs[name]["top_idx"],
                                          outs["one"]["top_idx"])


class TestGraftEntry:
    def test_entry_compiles(self):
        sys.path.insert(0, "/root/repo")
        ge = importlib.import_module("__graft_entry__")
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip(self):
        sys.path.insert(0, "/root/repo")
        ge = importlib.import_module("__graft_entry__")
        ge.dryrun_multichip(8)
