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


class TestSampleAxisTP:
    """VERDICT r1 #7: the 'sample' mesh axis does real work — the (n, n)
    rotate+whiten operator W is sharded over its contraction rows, so W
    (the HBM hog at large n) occupies 1/S of each chip; XLA psums the
    partial rotations. Exactness checked on pure-TP and mixed meshes."""

    def test_pure_tp_mesh_parity(self, small_dataset, kinship_small):
        devs = jax.devices()
        mesh_tp = make_mesh((1, 8), devices=devs[:8])
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        ref = emmax(G, y, K=K, stream=False)
        d = distributed_emmax(G, y, K=K, mesh=mesh_tp)
        np.testing.assert_allclose(d["ps"], ref["ps"], atol=1e-10)

    def test_w_is_sharded_over_samples(self, small_dataset, kinship_small):
        from jax.sharding import PartitionSpec as P

        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null
        from mixmogam_tpu.parallel.distributed import rot_shardings
        from mixmogam_tpu.parallel.mesh import put_global

        devs = jax.devices()
        mesh = make_mesh((2, 4), devices=devs[:8])
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        n = len(y)
        null = fit_null_model(y, np.ones((n, 1)), K=K)
        rot = build_rotated_null(null)
        shd = rot_shardings(mesh, rot)
        Wd = put_global(rot.W, shd.W)
        # each device holds an (n/4, n) row block of W, not the full W
        shard_shapes = {s.data.shape for s in Wd.addressable_shards}
        assert shard_shapes == {(n // 4, n)}

    def test_tp_mixed_mesh_int8_tier(self, small_dataset, kinship_small):
        """The (k, n, n) int8 digit-plane W also shards over 'sample'."""
        devs = jax.devices()
        mesh = make_mesh((2, 4), devices=devs[:8])
        G, y, K = (small_dataset["G_int"], small_dataset["y"],
                   kinship_small)
        ref = emmax(G, y, K=K, stream=False)
        d = distributed_emmax(G, y, K=K, mesh=mesh, dtype=np.float64,
                              rotate_in_bf16="int8x4")
        assert np.argmin(d["ps"]) == np.argmin(ref["ps"])
        assert np.max(np.abs(d["ps"] - ref["ps"])) < 1e-4
