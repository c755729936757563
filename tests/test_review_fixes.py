"""Regression tests for the round-1 code-review findings (silent-wrong-
result hazards): checkpoint-key collisions, lossy int8 casts on float
dosages, missing-data handling in the distributed kinship, a float32
likelihood-clamp underflow, NaN handling in the class tests, tier-name
validation, and kwargs silently dropped by emmax_anova's diploid path."""

import numpy as np
import pytest

from mixmogam_tpu.data.simulate import simulate_genotypes, simulate_phenotype


class TestStreamingManifestKey:
    def test_different_phenotypes_do_not_collide(self, tmp_path):
        """Two traits sharing a checkpoint_dir (same genotypes, same tile,
        both with REML delta clamped to the grid endpoint) must not read
        each other's cached tiles."""
        from mixmogam_tpu.models.streaming import emmax_streamed

        rng = np.random.default_rng(0)
        G, _, _ = simulate_genotypes(64, 200, seed=3)
        K = np.eye(64) + 0.01  # REML on pure noise clamps delta high
        y1 = rng.normal(size=64)
        y2 = rng.normal(size=64)
        d = str(tmp_path)
        r1 = emmax_streamed(G, y1, K=K, tile=64, checkpoint_dir=d)
        r2 = emmax_streamed(G, y2, K=K, tile=64, checkpoint_dir=d)
        fresh2 = emmax_streamed(G, y2, K=K, tile=64)
        assert np.allclose(r2["ps"], fresh2["ps"], atol=1e-10)
        assert not np.allclose(r1["ps"], r2["ps"])


class TestStepwiseStreamedFloat:
    def test_fractional_dosages_not_truncated(self, kinship_small,
                                              small_dataset):
        """The over-budget streamed stepwise path must give the same
        answer as the stored path for fractional (mean-imputed) float
        dosages instead of silently casting them to int8."""
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        G = small_dataset["G"].copy()
        rng = np.random.default_rng(1)
        miss = rng.random(G.shape) < 0.05
        G[miss] = np.nan
        mu = np.nanmean(G, axis=1)
        idx = np.where(np.isnan(G))
        G[idx] = mu[idx[0]]  # fractional imputed dosages, no NaN left
        y = small_dataset["y"]
        K = kinship_small
        stored = emmax_step_wise(G, y, K=K, max_steps=2)
        streamed = emmax_step_wise(G, y, K=K, max_steps=2,
                                   rot_budget_bytes=1)  # force streaming
        assert (stored["steps"][0]["min_p_snp"]
                == streamed["steps"][0]["min_p_snp"])
        np.testing.assert_allclose(
            stored["steps"][1]["min_p"], streamed["steps"][1]["min_p"],
            rtol=1e-6)

    def test_int_dosages_with_missing_stream_as_int8(self, kinship_small,
                                                     small_dataset):
        """Integer-valued float dosages with NaN missing stream via the
        int8 sentinel path and match the stored path."""
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        G = small_dataset["G"].copy()
        G[0, :3] = np.nan
        y = small_dataset["y"]
        stored = emmax_step_wise(G, y, K=kinship_small, max_steps=1)
        streamed = emmax_step_wise(G, y, K=kinship_small, max_steps=1,
                                   rot_budget_bytes=1)
        assert (stored["steps"][0]["min_p_snp"]
                == streamed["steps"][0]["min_p_snp"])


class TestDistributedKinshipMissing:
    def test_int8_missing_sentinel_matches_host_path(self):
        from mixmogam_tpu.ops.kinship import kinship
        from mixmogam_tpu.parallel.distributed import distributed_kinship

        G, _, _ = simulate_genotypes(48, 256, seed=5)
        G = G.astype(np.int8)
        G[1, :5] = -1
        G[100, 10:20] = -1
        Kd = distributed_kinship(G)
        Kh = kinship(G, method="ibs", use_device=False)
        np.testing.assert_allclose(Kd, Kh, atol=1e-9)

    def test_vanraden_missing(self):
        from mixmogam_tpu.ops.kinship import kinship
        from mixmogam_tpu.parallel.distributed import distributed_kinship

        G, _, _ = simulate_genotypes(48, 256, seed=6)
        Gf = G.astype(np.float64)
        Gf[2, :7] = np.nan
        Kd = distributed_kinship(Gf, method="vanraden")
        Kh = kinship(Gf, method="vanraden", dtype=np.float64)
        np.testing.assert_allclose(Kd, Kh, atol=1e-9)

    def test_ibs_rejects_diploid_coding(self):
        G = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.int8)
        from mixmogam_tpu.parallel.distributed import distributed_kinship

        with pytest.raises(ValueError, match="BINARY"):
            distributed_kinship(G, method="ibs")


class TestLlClampF32:
    def test_perfect_fit_stays_finite_in_float32(self):
        """A cancellation-driven ypy <= 0 must clamp to finfo(f32).tiny,
        not to 1e-300 (which underflows to 0 and yields LL = +inf)."""
        import jax.numpy as jnp

        from mixmogam_tpu.ops.xreml import _ll_from_moments

        A = jnp.asarray([[1.0]], dtype=jnp.float32)
        b = jnp.asarray([2.0], dtype=jnp.float32)
        c = jnp.asarray(4.0, dtype=jnp.float32)  # ypy = c - b'A^-1 b = 0
        ll, ypy, _ = _ll_from_moments(A, b, c,
                                      jnp.asarray(0.0, jnp.float32),
                                      jnp.asarray(0.0, jnp.float32),
                                      8, 1, True)
        assert np.isfinite(float(ll))
        assert float(ypy) > 0.0


class TestClassTestsNaN:
    def test_anova_nan_equals_int8_sentinel(self):
        from mixmogam_tpu.models.linear import anova

        rng = np.random.default_rng(2)
        G = rng.integers(0, 3, size=(40, 120)).astype(np.int8)
        G[3, :10] = -1
        y = rng.normal(size=120)
        Gf = G.astype(np.float64)
        Gf[G == -1] = np.nan
        a_int = anova(G, y)
        a_nan = anova(Gf, y)
        np.testing.assert_allclose(a_int["ps"], a_nan["ps"], atol=1e-12)
        # missing samples must NOT land in class 0: SNP 3 p differs from
        # the same SNP with missing replaced by 0
        G0 = G.copy()
        G0[G == -1] = 0
        a_zero = anova(G0, y)
        assert not np.isclose(a_nan["ps"][3], a_zero["ps"][3])

    def test_kruskal_nan_equals_int8_sentinel(self):
        from mixmogam_tpu.models.linear import kruskal_wallis

        rng = np.random.default_rng(3)
        G = rng.integers(0, 2, size=(25, 90)).astype(np.int8)
        G[5, :4] = -1
        y = rng.normal(size=90)
        Gf = G.astype(np.float64)
        Gf[G == -1] = np.nan
        np.testing.assert_allclose(kruskal_wallis(G, y)["ps"],
                                   kruskal_wallis(Gf, y)["ps"], atol=1e-12)

    def test_anova_fractional_classifies_nearest(self):
        from mixmogam_tpu.models.linear import anova

        rng = np.random.default_rng(4)
        G = rng.integers(0, 3, size=(10, 80))
        y = rng.normal(size=80)
        Gf = G + rng.uniform(-0.3, 0.3, size=G.shape)  # imputed-like
        np.testing.assert_allclose(anova(G, y)["ps"], anova(Gf, y)["ps"],
                                    atol=1e-12)


class TestTierValidation:
    def test_near_miss_tier_names_raise(self):
        from mixmogam_tpu.ops.scan import normalize_rotate_tier

        for bad in ("int8", "int8x5", "fp8", "x9"):
            with pytest.raises(ValueError, match="rotation tier"):
                normalize_rotate_tier(bad)

    def test_canonical_spellings(self):
        import jax.numpy as jnp

        from mixmogam_tpu.ops.scan import normalize_rotate_tier as norm

        assert norm(False) is None and norm(None) is None
        assert norm(True) == jnp.bfloat16 and norm("bf16") == jnp.bfloat16
        assert norm("x2") == "bf16x2" and norm("int8x3") == "int8x3"

    def test_emmax_rejects_nan_for_int8_tier(self, kinship_small,
                                             small_dataset):
        from mixmogam_tpu.models.emmax import emmax

        G = small_dataset["G"].copy()
        G[0, 0] = np.nan
        with pytest.raises(ValueError, match="integer dosages"):
            emmax(G, small_dataset["y"], K=kinship_small,
                  precision="int8x3")


class TestEmmaxAnovaKwargs:
    def test_diploid_rejects_unsupported_kwargs(self):
        from mixmogam_tpu.models.emmax import emmax_anova

        rng = np.random.default_rng(5)
        G = rng.integers(0, 3, size=(20, 60)).astype(np.int8)
        y = rng.normal(size=60)
        K = np.eye(60) + 0.01
        with pytest.raises(TypeError, match="diploid path"):
            emmax_anova(G, y, K=K, precision="bf16")

    def test_diploid_accepts_esp_host_eigh(self):
        from mixmogam_tpu.models.emmax import emmax_anova

        rng = np.random.default_rng(6)
        G = rng.integers(0, 3, size=(20, 60)).astype(np.int8)
        y = rng.normal(size=60)
        K = np.eye(60) + 0.01
        out = emmax_anova(G, y, K=K, esp=1e-8, host_eigh=True)
        assert out["ps"].shape == (20,)


class TestPermIdentityPath:
    def test_k_none_matches_identity_kinship(self, small_dataset):
        """The rotation-free K=None path must agree with an explicit
        identity-like run at the same delta (sd == 1 both ways)."""
        from mixmogam_tpu.models.permutation import emmax_perm_test

        out = emmax_perm_test(small_dataset["G"], small_dataset["y"],
                              K=None, num_perm=8, seed=0)
        assert out["min_ps"].shape == (8,)
        assert np.all(out["min_ps"] > 0) and np.all(out["min_ps"] <= 1)
        # deterministic across calls
        out2 = emmax_perm_test(small_dataset["G"], small_dataset["y"],
                               K=None, num_perm=8, seed=0)
        np.testing.assert_allclose(out["min_ps"], out2["min_ps"])


class TestDataLayerFixes:
    """Second review batch: parser, packer, facade findings."""

    def test_nucleotide_monomorphic_missing_N(self, tmp_path):
        """Missing 'N' calls must stay missing — the 'N' major/minor
        placeholder used to hand them real dosages, making monomorphic
        SNPs polymorphic (perfectly correlated with missingness)."""
        from mixmogam_tpu.data.parsers import parse_snp_data

        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c,d\n"
                     "1,100,A,A,A,N\n"      # monomorphic + missing
                     "1,200,N,N,N,N\n"      # all missing
                     "1,300,A,C,C,N\n")     # biallelic + missing
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.matrix[0].tolist() == [0, 0, 0, -1]
        assert gd.matrix[1].tolist() == [-1, -1, -1, -1]
        assert gd.matrix[2].tolist() == [1, 0, 0, -1]

    def test_native_parser_blank_lines(self, tmp_path):
        from mixmogam_tpu import native

        if not native.available():
            pytest.skip("native lib unavailable")
        p = tmp_path / "g.csv"
        p.write_text("Chromosome,Position,a,b,c\n"
                     "1,100,0,1,2\n\n2,200,1,0,1\n\n")
        mat, ch, po, n = native.parse_dosage_csv(str(p))
        assert mat.shape == (2, 3)
        assert ch.tolist() == [1, 2] and po.tolist() == [100, 200]

    def test_native_parser_padded_tokens(self, tmp_path):
        from mixmogam_tpu import native

        if not native.available():
            pytest.skip("native lib unavailable")
        p = tmp_path / "g.csv"
        p.write_text("Chromosome,Position,a,b,c\n2,200, 1, 0 ,NA\n")
        mat, _, _, _ = native.parse_dosage_csv(str(p))
        assert mat[0].tolist() == [1, 0, -1]

    def test_nonnumeric_chromosome_raises(self, tmp_path):
        """Native path must NOT silently map 'X'/'Chr1' to 0/1; the
        fallback Python parser raises."""
        from mixmogam_tpu.data.parsers import parse_snp_data

        p = tmp_path / "g.csv"
        p.write_text("Chromosome,Position,a,b,c\nX,100,0,1,0\n")
        with pytest.raises(ValueError):
            parse_snp_data(str(p))

    def test_garbage_token_raises(self, tmp_path):
        from mixmogam_tpu.data.parsers import parse_snp_data

        p = tmp_path / "g.csv"
        p.write_text("Chromosome,Position,a,b,c\n1,100,0,zz,1\n")
        with pytest.raises(ValueError):
            parse_snp_data(str(p))

    def test_pack_2bit_rejects_out_of_range(self):
        from mixmogam_tpu import native

        with pytest.raises(ValueError, match="0..2"):
            native.pack_2bit(np.array([[0, 1, 2, 3]], dtype=np.int8))
        rt = native.unpack_2bit(
            native.pack_2bit(np.array([[0, 1, 2, -1]], dtype=np.int8)), 4)
        assert rt[0].tolist() == [0, 1, 2, -1]

    def test_result_write_roundtrip(self, tmp_path):
        from mixmogam_tpu.results.result import Result

        ps = np.array([1e-8, 0.5, 0.123456789012345, 1.0])
        r = Result(ps, np.array([1, 1, 2, 2]),
                   np.array([10, 20, 30, 40]),
                   mafs=np.array([0.1, 0.2, 0.3, 0.4]),
                   score_type="pvals")
        f = tmp_path / "out.csv"
        r.write_to_file(str(f))
        lines = f.read_text().strip().split("\n")
        assert len(lines) == 5  # header + 4 rows, no phantom rows
        hdr = lines[0].split(",")
        row0 = dict(zip(hdr, lines[1].split(",")))
        assert float(row0["scores"]) == 1e-8  # sorted ascending p

    def test_genotype_write_csv_roundtrip(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.parsers import parse_snp_data

        G = np.array([[0, 1, -1], [2, 0, 1]], dtype=np.int8)
        gd = GenotypeData(G, np.array([1, 2], np.int32),
                          np.array([5, 9], np.int64), ["a", "b", "c"],
                          ploidy=2)
        f = tmp_path / "g.csv"
        gd.write_csv(str(f))
        gd2 = parse_snp_data(str(f), ploidy=2)
        np.testing.assert_array_equal(gd2.matrix, G)
        np.testing.assert_array_equal(gd2.positions, gd.positions)

    def test_convert_to_averages_empty_pids_is_noop(self):
        from mixmogam_tpu.data.phenotype import PhenotypeData

        pd = PhenotypeData.from_arrays(1, "t", ["a", "a", "b"],
                                       np.array([1.0, 3.0, 5.0]))
        pd.convert_to_averages(pids=[])
        assert len(pd.phen_dict[1].values) == 3  # untouched
        pd.convert_to_averages()
        assert len(pd.phen_dict[1].values) == 2  # replicates averaged

    def test_run_gwas_covariates_rejected_for_anova(self, tmp_path):
        from mixmogam_tpu.api import run_gwas
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.phenotype import PhenotypeData

        G, ch, po = simulate_genotypes(30, 40, seed=9)
        gd = GenotypeData(G, ch, po, [f"a{i}" for i in range(30)])
        gf = tmp_path / "g.csv"
        gd.write_csv(str(gf))
        rng = np.random.default_rng(0)
        pf = tmp_path / "p.csv"
        with open(pf, "w") as f:
            f.write("ecotype_id,trait,cov\n")
            for i in range(30):
                f.write(f"a{i},{rng.normal()},{rng.normal()}\n")
        with pytest.raises(ValueError, match="covariate"):
            run_gwas(str(gf), str(pf), pid=1, method="anova",
                     covariate_pids=[2], min_mac=1, plots=False)
