"""Profiling utils + CLI surface tests."""

import json

import numpy as np
import pytest


class TestRunMetrics:
    def test_phases_and_write(self, tmp_path):
        from mixmogam_tpu.utils.profiling import RunMetrics

        rm = RunMetrics("t")
        with rm.phase("a"):
            x = np.arange(10).sum()
        with rm.phase("b") as box:
            box["fence"] = None
        rm.set("x", int(x))
        rate = rm.throughput("r", 100, "a")
        assert rate > 0
        p = tmp_path / "m.json"
        rm.write(str(p))
        d = json.loads(p.read_text())
        assert set(d["phases_s"]) == {"a", "b"}
        assert d["metrics"]["x"] == 45

    def test_debug_nans_context(self):
        import jax

        from mixmogam_tpu.utils.profiling import debug_nans

        prev = jax.config.jax_debug_nans
        with debug_nans(True):
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == prev


class TestCli:
    def test_info(self, capsys):
        from mixmogam_tpu.cli import main

        assert main(["info"]) == 0
        out = capsys.readouterr().out
        assert "mixmogam-tpu" in out and "backend" in out

    def test_bad_method_rejected(self):
        from mixmogam_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["run", "a.csv", "b.csv", "--method", "nope"])

    def test_esp_to_refine_iters(self):
        from mixmogam_tpu.ops.reml import esp_to_refine_iters

        assert esp_to_refine_iters(1e-6) == 18
        assert esp_to_refine_iters(1e-30) == 64  # clamped
        assert esp_to_refine_iters(1.0) == 16    # clamped


class TestFetchArray:
    """ops/transfer.fetch_array — chunked-async D2H (content parity;
    the throughput claim is scripts/d2h_probe.py's)."""

    def test_matches_asarray_across_shapes(self):
        import jax.numpy as jnp
        import numpy as np

        from mixmogam_tpu.ops.transfer import fetch_array

        for shape, chunk in [((64, 17), 256), ((64, 17), 1 << 30),
                             ((7,), 64), ((33, 5, 2), 128)]:
            x = jnp.arange(int(np.prod(shape)),
                           dtype=jnp.float32).reshape(shape)
            np.testing.assert_array_equal(fetch_array(x, chunk_bytes=chunk),
                                          np.asarray(x))

    def test_host_input_passthrough(self):
        import numpy as np

        from mixmogam_tpu.ops.transfer import fetch_array

        a = np.random.default_rng(0).normal(size=(10, 3))
        np.testing.assert_array_equal(fetch_array(a), a)
