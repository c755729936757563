"""Kernel-level tests: Pallas kinship (interpret mode on CPU), int8 MXU
fast path, bf16 rotation fast path (SURVEY.md §4.2 'kernel parity')."""

import jax.numpy as jnp
import numpy as np
import pytest

from mixmogam_tpu import oracle
from mixmogam_tpu.data.simulate import simulate_genotypes
from mixmogam_tpu.models import emmax
from mixmogam_tpu.ops import kinship as dk
from mixmogam_tpu.ops.kinship import _ibs_int8_streamed
from mixmogam_tpu.ops.pallas_kinship import pallas_ibs_kinship


class TestPallasKinship:
    def test_exact_vs_oracle(self):
        G, _, _ = simulate_genotypes(100, 777, seed=1)  # odd sizes -> pads
        Ko = oracle.ibs_kinship(G.astype(np.float64))
        Kp = pallas_ibs_kinship(G, tm=128, tn=128)
        assert np.max(np.abs(Kp - Ko)) == 0.0  # integer-exact

    def test_small_matrix(self):
        G = np.array([[0, 1, 1], [1, 1, 0], [0, 0, 0], [1, 1, 1]],
                     dtype=np.int8)
        Ko = oracle.ibs_kinship(G.astype(np.float64))
        Kp = pallas_ibs_kinship(G, tm=128, tn=128)
        np.testing.assert_array_equal(Kp, Ko)

    def test_missing_rejected(self):
        G = np.array([[0, -1], [1, 0]], dtype=np.int8)
        with pytest.raises(ValueError):
            pallas_ibs_kinship(G)

    def test_triangular_exact_vs_oracle(self):
        from mixmogam_tpu.ops.pallas_kinship import pallas_ibs_kinship_tri

        G, _, _ = simulate_genotypes(300, 700, seed=5)  # pads both axes
        Ko = oracle.ibs_kinship(G.astype(np.float64))
        Kt = pallas_ibs_kinship_tri(G, tm=256, tn=128)
        assert np.max(np.abs(Kt - Ko)) == 0.0  # integer-exact, symmetric

    def test_triangular_missing_rejected(self):
        from mixmogam_tpu.ops.pallas_kinship import pallas_ibs_kinship_tri

        G = np.array([[0, -1], [1, 0]], dtype=np.int8)
        with pytest.raises(ValueError):
            pallas_ibs_kinship_tri(G)


class TestInt8Path:
    def test_streamed_int8_exact(self):
        G, _, _ = simulate_genotypes(64, 500, seed=2)
        Ko = oracle.ibs_kinship(G.astype(np.float64))
        Ks = _ibs_int8_streamed(G, chunk=128)
        assert np.max(np.abs(Ks - Ko)) == 0.0

    def test_kinship_router_picks_int8(self):
        """int8 binary fully-observed input routes through the exact
        integer path automatically."""
        G, _, _ = simulate_genotypes(40, 300, seed=3)
        K = dk.kinship(G, method="ibs", chunk=64)
        Ko = oracle.ibs_kinship(G.astype(np.float64))
        assert np.max(np.abs(K - Ko)) == 0.0

    def test_diploid_int8_exact(self):
        from mixmogam_tpu.data.simulate import simulate_genotypes
        from mixmogam_tpu.ops.kinship import _ibs_diploid_int8_streamed

        G, _, _ = simulate_genotypes(40, 333, ploidy=2, seed=5)  # odd M
        Ko = oracle.ibs_kinship(G.astype(np.float64), ploidy=2)
        Ks = _ibs_diploid_int8_streamed(G, chunk=128)
        assert np.max(np.abs(Ks - Ko)) == 0.0
        # router picks it automatically
        Kr = dk.kinship(G, method="ibs", ploidy=2, chunk=128)
        assert np.max(np.abs(Kr - Ko)) == 0.0

    def test_kinship_router_missing_falls_back(self):
        G, _, _ = simulate_genotypes(40, 300, missing_rate=0.05, seed=3)
        K = dk.kinship(G, method="ibs", chunk=64, dtype=jnp.float64)
        Gf = G.astype(np.float64)
        Gf[G < 0] = np.nan
        Ko = oracle.ibs_kinship(Gf)
        np.testing.assert_allclose(K, Ko, atol=1e-10)


class TestPallasScan:
    def test_fused_scan_parity(self, small_dataset, kinship_small):
        from mixmogam_tpu.ops.pallas_scan import pallas_scan_stats
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_stats

        G = small_dataset["G"].astype(np.float32)
        y = small_dataset["y"].astype(np.float32)
        K = kinship_small.astype(np.float32)
        null = fit_null_model(y, np.ones((len(y), 1), np.float32), K=K)
        rot = build_rotated_null(null)
        G_rot = jnp.asarray(G) @ null.U
        ref = emmax_scan_stats(G_rot, rot, pre_rotated=True)
        pal = pallas_scan_stats(G_rot, rot, tm=128, tn=128)
        np.testing.assert_array_equal(np.asarray(ref["mask"]),
                                      np.asarray(pal["mask"]))
        np.testing.assert_allclose(np.asarray(pal["f_stats"]),
                                   np.asarray(ref["f_stats"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pal["betas"]),
                                   np.asarray(ref["betas"]), atol=1e-5)

    def test_fused_rotate_scan_parity(self, small_dataset, kinship_small):
        """pallas_rotate_scan (raw G in, split-W rotation fused with the
        epilogue, Xs VMEM-resident) vs the XLA split-W path."""
        from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all

        G = small_dataset["G_int"]
        y = small_dataset["y"].astype(np.float32)
        K = kinship_small.astype(np.float32)
        null = fit_null_model(y, np.ones((len(y), 1), np.float32), K=K)
        rot3 = build_rotated_null(null, rotate_dtype="bf16x3")
        ref = emmax_scan_all(jnp.asarray(G.astype(np.float32)), rot3,
                             tile=256)
        pal = pallas_rotate_scan(G, rot3, tm=128, nb=128)
        np.testing.assert_array_equal(np.asarray(ref["mask"]),
                                      np.asarray(pal["mask"]))
        np.testing.assert_allclose(np.asarray(pal["f_stats"]),
                                   np.asarray(ref["f_stats"]),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pal["betas"]),
                                   np.asarray(ref["betas"]), atol=1e-5)

    def test_fused_rotate_scan_needs_split_rot(self, small_dataset,
                                               kinship_small):
        from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null

        y = small_dataset["y"].astype(np.float32)
        K = kinship_small.astype(np.float32)
        null = fit_null_model(y, np.ones((len(y), 1), np.float32), K=K)
        with pytest.raises(ValueError):
            pallas_rotate_scan(small_dataset["G_int"],
                               build_rotated_null(null))


class TestBf16Rotation:
    def test_bf16_scan_close_and_rank_stable(self, small_dataset,
                                             kinship_small):
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        exact = emmax(G, y, K=K, dtype=np.float32)
        fast = emmax(G, y, K=K, dtype=np.float32, rotate_in_bf16=True)
        lp_e = -np.log10(np.maximum(exact["ps"], 1e-300))
        lp_f = -np.log10(np.maximum(fast["ps"], 1e-300))
        # bf16 rotation: small absolute error, identical leaders
        assert np.max(np.abs(lp_e - lp_f)) < 0.35
        assert np.argmin(exact["ps"]) == np.argmin(fast["ps"])
        # regression: dof must NOT round through bf16 (198 != bf16(198))
        assert fast["dof"] == exact["dof"] == len(y) - 2

    def test_split_w_tiers_accuracy_ladder(self, small_dataset,
                                           kinship_small):
        """Split-W tiers (W = sum of K bf16 terms, integer G exact in
        bf16): each extra term adds ~8 mantissa bits, so p-drift vs fp32
        drops ~1e-3 -> ~1e-5 -> ~1e-7 (measured 6e-3/1.2e-5/8.8e-7 on
        v5e, scripts/splitw_bench.py)."""
        G = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        ex = emmax(G, y, K=K, dtype=np.float32)
        drifts = []
        for tier in (True, "x2", "x3"):
            f = emmax(G, y, K=K, dtype=np.float32, rotate_in_bf16=tier)
            drifts.append(np.max(np.abs(f["ps"] - ex["ps"])))
            assert np.argmin(f["ps"]) == np.argmin(ex["ps"])
        assert drifts[0] < 5e-2
        assert drifts[1] < 1e-4
        assert drifts[2] < 1e-6
        assert drifts[2] < drifts[1] < drifts[0]
        # concatenated variants (one wide matmul) match their stacked
        # twins to float-add reassociation level
        for tier, ref_drift in (("x2c", drifts[1]), ("x3c", drifts[2])):
            f = emmax(G, y, K=K, dtype=np.float32, rotate_in_bf16=tier)
            d = np.max(np.abs(f["ps"] - ex["ps"]))
            assert d < 10 * ref_drift + 1e-7

    def test_int8_digit_tiers_accuracy_ladder(self, small_dataset,
                                              kinship_small):
        """int8 digit-plane tiers ('int8xK'): W fixed-pointed per column
        to 8K-2 bits and split into K signed int8 digit planes; integer
        dosages make each digit matmul EXACT (int32 accumulation), so the
        only error is W's quantization + one final f32 recombine.
        Expected ladder: int8x2 (14 bits) ~1e-4, int8x3 (22 bits)
        fp32-grade <=1e-6, int8x4 (30 bits) at or below int8x3."""
        G = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        ex = emmax(G, y, K=K, dtype=np.float32)
        drifts = {}
        for tier in ("int8x2", "int8x3", "int8x4"):
            f = emmax(G, y, K=K, dtype=np.float32, rotate_in_bf16=tier)
            drifts[tier] = np.max(np.abs(f["ps"] - ex["ps"]))
            assert np.argmin(f["ps"]) == np.argmin(ex["ps"])
        assert drifts["int8x2"] < 1e-3
        assert drifts["int8x3"] < 2e-6
        assert drifts["int8x4"] < 2e-6
        assert drifts["int8x4"] <= drifts["int8x3"] < drifts["int8x2"]

    def test_int8_tier_rejects_fractional_dosages(self, small_dataset,
                                                  kinship_small):
        """Mean-imputed fractional dosages would be silently rounded by
        the digit-plane tier — the facade must refuse instead."""
        G = small_dataset["G"].astype(np.float64).copy()
        G[0, 0] = 0.37  # imputed-looking fractional dosage
        y, K = small_dataset["y"], kinship_small
        with pytest.raises(ValueError, match="integer dosages"):
            emmax(G, y, K=K, dtype=np.float32, rotate_in_bf16="int8x3")


class TestFp32Characterization:
    def test_fp32_vs_f64_accuracy_envelope(self, small_dataset,
                                           kinship_small):
        """Pin the fp32 (TPU production dtype) accuracy envelope vs the
        float64 path: -log10 p within 0.05, ranks of the leaders stable.
        (The 1e-6 parity gate is the float64 path; this documents what
        fp32 delivers — see docs/ALGORITHMS.md precision policy.)"""
        G, y, K = small_dataset["G"], small_dataset["y"], kinship_small
        full = emmax(G, y, K=K)  # float64 under the test config
        f32 = emmax(G, y, K=K, dtype=np.float32)
        lp_a = -np.log10(np.maximum(full["ps"], 1e-300))
        lp_b = -np.log10(np.maximum(f32["ps"], 1e-300))
        assert np.max(np.abs(lp_a - lp_b)) < 0.05
        top_a = np.argsort(full["ps"])[:10]
        top_b = np.argsort(f32["ps"])[:10]
        assert set(top_a) == set(top_b)
        assert abs(full["pseudo_heritability"]
                   - f32["pseudo_heritability"]) < 1e-4


class TestInputHandling:
    def test_int8_device_path_matches_float(self, small_dataset,
                                            kinship_small):
        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        a = emmax(G_int, y, K=K, dtype=np.float32)
        b = emmax(G_int.astype(np.float32), y, K=K, dtype=np.float32)
        np.testing.assert_allclose(a["ps"], b["ps"], atol=1e-12)

    def test_float_nan_imputed_like_int8(self):
        from mixmogam_tpu.data.simulate import simulate_genotypes

        G, _, _ = simulate_genotypes(50, 200, missing_rate=0.05, seed=8)
        Gf = G.astype(np.float64)
        Gf[G < 0] = np.nan
        Ki = dk.kinship(G, method="ibs", chunk=64, dtype=jnp.float64)
        Kf = dk.kinship(Gf, method="ibs", chunk=64, dtype=jnp.float64)
        np.testing.assert_allclose(Kf, Ki, atol=1e-12)
        assert np.isfinite(Kf).all()

    def test_1d_covariate_becomes_column(self, small_dataset,
                                         kinship_small):
        G, y, K = small_dataset["G"][:20], small_dataset["y"], kinship_small
        cov = np.random.default_rng(0).normal(size=len(y))
        X0 = np.hstack([np.ones((len(y), 1)), cov[:, None]])
        ref = emmax(G, y, K=K, X0=X0)
        # passing the intercept-free 1-D covariate must raise nothing and
        # produce a (n, 1) design
        from mixmogam_tpu.models.emmax import _as_design

        assert _as_design(cov, len(y)).shape == (len(y), 1)
        with pytest.raises(ValueError):
            _as_design(cov[:-1], len(y))
        with pytest.raises(ValueError):
            _as_design(np.ones((3, len(y), 1)), len(y))


class TestPrecisionRouting:
    """Unified precision= kwarg + 'auto' tier routing (ops.scan
    resolve_precision): int8x3 measured faster than exact on every TPU
    process at fp32-grade accuracy, so 'auto' routes integer-dosage
    datasets there on TPU backends and everything else to exact."""

    def test_resolve_auto_tier(self):
        from mixmogam_tpu.ops.scan import is_integer_dosage, resolve_precision

        Gi = np.array([[0, 1, 2], [1, 0, 1]], np.int8)
        Gfrac = np.array([[0.0, 0.37, 1.0]])
        assert resolve_precision("auto", Gi, backend="tpu")[2] == "int8x3"
        assert resolve_precision("auto", Gi, backend="axon")[2] == "int8x3"
        assert resolve_precision("auto", Gi, backend="cpu")[2] == "exact"
        assert resolve_precision("auto", Gfrac, backend="tpu")[2] == "exact"
        # integer-VALUED floats are safe for the digit planes
        assert resolve_precision("auto", Gi.astype(np.float32),
                                 backend="tpu")[2] == "int8x3"
        # out-of-int8-range integers are not
        assert not is_integer_dosage(np.array([[300]], np.int16))
        assert not is_integer_dosage(np.array([[np.nan, 1.0]]))
        with pytest.raises(ValueError, match="unknown precision"):
            resolve_precision("int9", Gi)

    def test_normalize_rotate_tier(self):
        from mixmogam_tpu.ops.scan import normalize_rotate_tier

        assert normalize_rotate_tier(False) is None
        assert normalize_rotate_tier(None) is None
        assert normalize_rotate_tier(True) == jnp.bfloat16
        assert normalize_rotate_tier("x2") == "bf16x2"
        assert normalize_rotate_tier("bf16x3") == "bf16x3"
        assert normalize_rotate_tier("int8x3") == "int8x3"

    def test_precision_kwarg_routes_and_reports(self, small_dataset,
                                                kinship_small):
        G, y, K = small_dataset["G_int"], small_dataset["y"], kinship_small
        ex = emmax(G, y, K=K, dtype=np.float32, precision="exact")
        assert ex["precision_tier"] == "exact"
        f = emmax(G, y, K=K, dtype=np.float32, precision="int8x3")
        assert f["precision_tier"] == "int8x3"
        assert np.max(np.abs(f["ps"] - ex["ps"])) < 2e-6
        # 'auto' on the CPU test backend resolves to exact (no int8-rate
        # MXU to win on) and is bit-identical to the exact tier
        a = emmax(G, y, K=K, dtype=np.float32, precision="auto")
        assert a["precision_tier"] == "exact"
        np.testing.assert_array_equal(a["ps"], ex["ps"])
        # legacy kwargs still report their tier
        leg = emmax(G, y, K=K, dtype=np.float32, rotate_in_bf16="int8x2")
        assert leg["precision_tier"] == "int8x2"

    def test_precision_conflicts_with_legacy_kwargs(self, small_dataset,
                                                    kinship_small):
        G, y, K = small_dataset["G_int"], small_dataset["y"], kinship_small
        with pytest.raises(ValueError, match="not both"):
            emmax(G, y, K=K, precision="bf16", rotate_in_bf16=True)


class TestPallasInt8RotateScan:
    def test_int8_fused_parity(self, small_dataset, kinship_small):
        """pallas_rotate_scan_int8 (raw int8 G, digit-plane dots fused
        with the epilogue) vs the XLA int8x3 tier on the SAME rot."""
        from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan_int8
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all

        G = small_dataset["G_int"]
        y = small_dataset["y"].astype(np.float32)
        K = kinship_small.astype(np.float32)
        null = fit_null_model(y, np.ones((len(y), 1), np.float32), K=K)
        rot = build_rotated_null(null, rotate_dtype="int8x3")
        ref = emmax_scan_all(jnp.asarray(G), rot, tile=256)
        pal = pallas_rotate_scan_int8(G, rot, tm=128, nb=128)
        np.testing.assert_array_equal(np.asarray(ref["mask"]),
                                      np.asarray(pal["mask"]))
        np.testing.assert_allclose(np.asarray(pal["f_stats"]),
                                   np.asarray(ref["f_stats"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pal["betas"]),
                                   np.asarray(ref["betas"]), atol=1e-5)

    def test_int8_fused_rejects_float_rot(self, small_dataset,
                                          kinship_small):
        from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan_int8
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null

        y = small_dataset["y"].astype(np.float32)
        null = fit_null_model(y, np.ones((len(y), 1), np.float32),
                              K=kinship_small.astype(np.float32))
        with pytest.raises(ValueError):
            pallas_rotate_scan_int8(small_dataset["G_int"],
                                    build_rotated_null(null))
