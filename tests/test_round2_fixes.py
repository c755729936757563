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
        # row 2: raw per-call copy ranking: G appears in 'G'(1) + 'R'(1),
        # A in 'R'(1) + 'A'(1) -> tie broken alphabetically: major=A,
        # minor=G. Dosage = G copies, x2 for homozygous single-letter
        # calls under diploid: G->2, R->1, A->0
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


class TestEmmaxAutoStream:
    """VERDICT r1 #6: emmax() must not OOM at config #3 sizes — it routes
    to the streamed path by device-footprint budget."""

    def test_budget_routes_to_streaming(self, small_dataset, kinship_small):
        from mixmogam_tpu.models import emmax

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        ref = emmax(G_int, y, K=K, stream=False)
        st = emmax(G_int, y, K=K, stream_budget_bytes=1024)  # forces stream
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-9)
        np.testing.assert_array_equal(st["mask"], ref["mask"])
        np.testing.assert_allclose(st["betas"], ref["betas"], atol=1e-9)

    def test_stream_true_forces(self, small_dataset, kinship_small):
        from mixmogam_tpu.models import emmax

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        st = emmax(G_int, y, K=K, stream=True)
        ref = emmax(G_int, y, K=K, stream=False)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-9)

    def test_stream_float_source_with_nan(self, kinship_small,
                                          small_dataset):
        """Float sources with NaN missing stream with host-side per-tile
        imputation and match the in-core path."""
        from mixmogam_tpu.models import emmax

        rng = np.random.default_rng(3)
        Gf = small_dataset["G_int"].astype(np.float64)
        Gf[rng.random(Gf.shape) < 0.05] = np.nan
        y, K = small_dataset["y"], kinship_small
        ref = emmax(Gf, y, K=K, stream=False)
        st = emmax(Gf, y, K=K, stream=True, tile=8192)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-9)

    def test_checkpoint_dir_requires_stream(self, small_dataset,
                                            kinship_small):
        from mixmogam_tpu.models import emmax

        with pytest.raises(ValueError, match="stream"):
            emmax(small_dataset["G_int"], small_dataset["y"],
                  K=kinship_small, stream=False, checkpoint_dir="/tmp/x")

    def test_streamed_respects_esp(self, small_dataset, kinship_small):
        """esp now reaches the streamed null fit (same delta as in-core)."""
        from mixmogam_tpu.models import emmax

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        a = emmax(G_int, y, K=K, stream=True, esp=1e-6)
        b = emmax(G_int, y, K=K, stream=False, esp=1e-6)
        assert abs(a["delta"] - b["delta"]) < 1e-9


class TestKruskalWallisMissing:
    """VERDICT r1 #8: missing-data KW is vectorized (no per-SNP host
    loop); parity vs the scipy oracle on per-SNP observed subsets."""

    def _oracle_loop(self, G, y):
        from mixmogam_tpu.oracle.glm import kruskal_wallis_scan

        ps = np.ones(G.shape[0])
        hs = np.zeros(G.shape[0])
        for j in range(G.shape[0]):
            keep = G[j] >= 0
            r = kruskal_wallis_scan(G[j:j + 1, keep], y[keep])
            ps[j] = r["ps"][0]
            hs[j] = r["stats"][0]
        return ps, hs

    def test_missing_parity_vs_scipy(self):
        from mixmogam_tpu.models.linear import kruskal_wallis

        rng = np.random.default_rng(7)
        G = rng.integers(0, 2, size=(80, 60)).astype(np.int8)
        G[rng.random(G.shape) < 0.15] = -1
        y = rng.normal(size=60)
        out = kruskal_wallis(G, y)
        ps_ref, hs_ref = self._oracle_loop(G, y)
        np.testing.assert_allclose(out["ps"], ps_ref, atol=1e-10)
        np.testing.assert_allclose(out["stats"], hs_ref, atol=1e-10)

    def test_missing_with_ties_diploid(self):
        from mixmogam_tpu.models.linear import kruskal_wallis

        rng = np.random.default_rng(11)
        G = rng.integers(0, 3, size=(50, 40)).astype(np.int8)
        G[rng.random(G.shape) < 0.25] = -1
        # heavy y ties to stress the per-subset tie correction
        y = np.round(rng.normal(size=40) * 2) / 2
        out = kruskal_wallis(G, y, ploidy=2)
        ps_ref, hs_ref = self._oracle_loop(G, y)
        np.testing.assert_allclose(out["ps"], ps_ref, atol=1e-10)

    def test_degenerate_rows(self):
        from mixmogam_tpu.models.linear import kruskal_wallis

        rng = np.random.default_rng(2)
        y = rng.normal(size=20)
        G = np.vstack([
            np.full(20, -1, np.int8),             # all missing
            np.r_[np.zeros(19), [-1]].astype(np.int8),  # monomorphic
            np.r_[np.zeros(10), np.ones(10)].astype(np.int8),
        ])
        out = kruskal_wallis(G, y)
        assert out["ps"][0] == 1.0 and out["ps"][1] == 1.0
        assert out["ps"][2] < 1.0
        ps_ref, _ = self._oracle_loop(G, y)
        np.testing.assert_allclose(out["ps"], ps_ref, atol=1e-10)

    def test_tiling_boundary(self):
        from mixmogam_tpu.models.linear import kruskal_wallis

        rng = np.random.default_rng(5)
        G = rng.integers(0, 2, size=(10, 30)).astype(np.int8)
        G[rng.random(G.shape) < 0.1] = -1
        y = rng.normal(size=30)
        a = kruskal_wallis(G, y, tile=3)   # forces padding + many tiles
        b = kruskal_wallis(G, y, tile=4096)
        np.testing.assert_allclose(a["ps"], b["ps"], atol=1e-12)


class TestTwoSnpApi:
    """VERDICT r1 #10: explicit focal set + oracle interaction-F parity."""

    def _data(self):
        from mixmogam_tpu.data.simulate import simulate_genotypes

        rng = np.random.default_rng(21)
        G, ch, po = simulate_genotypes(40, 60, seed=21)
        Gf = G.astype(np.float64)
        # plant an interaction between SNPs 3 and 17
        y = (0.3 * Gf[3] + 0.3 * Gf[17] + 1.5 * Gf[3] * Gf[17]
             + rng.normal(size=40) * 0.5)
        K = np.eye(40) + 0.1 * (Gf.T @ Gf) / 60
        d = np.sqrt(np.diag(K))
        K = K / np.outer(d, d)
        return Gf, y, K

    def test_focal_idx_none_raises(self):
        from mixmogam_tpu.models.twosnp import emmax_two_snps

        Gf, y, K = self._data()
        with pytest.raises(ValueError, match="focal"):
            emmax_two_snps(Gf, y, K=K)

    def test_from_result_top_k(self):
        from mixmogam_tpu.models import emmax
        from mixmogam_tpu.models.twosnp import emmax_two_snps

        Gf, y, K = self._data()
        scan = emmax(Gf, y, K=K)
        r = emmax_two_snps(Gf, y, K=K, from_result=scan, top_k=4)
        expect = np.argsort(scan["ps"], kind="stable")[:4]
        np.testing.assert_array_equal(np.sort(r["focal_idx"]),
                                      np.sort(expect))
        assert r["cond_ps"].shape == (4, Gf.shape[0])

    def test_focal_idx_out_of_range(self):
        from mixmogam_tpu.models.twosnp import emmax_two_snps

        Gf, y, K = self._data()
        with pytest.raises(ValueError, match="range"):
            emmax_two_snps(Gf, y, K=K, focal_idx=[0, 999])

    def test_interaction_f_oracle_parity(self):
        """inter_ps must equal the exact per-pair GLS interaction F
        computed with numpy lstsq in the whitened basis at the same
        global delta."""
        import scipy.linalg
        import scipy.stats

        from mixmogam_tpu.models.twosnp import emmax_two_snps

        Gf, y, K = self._data()
        n, M = len(y), Gf.shape[0]
        a = 3
        r = emmax_two_snps(Gf, y, K=K, focal_idx=[a])
        delta = r["delta"]
        phi, U = scipy.linalg.eigh(K)
        Hm12 = U @ np.diag(1.0 / np.sqrt(phi + delta)) @ U.T
        ys = Hm12 @ y
        ones = Hm12 @ np.ones((n, 1))
        ga = Hm12 @ Gf[a]
        for b in [5, 17, 40]:
            gb = Hm12 @ Gf[b]
            prod = Hm12 @ (Gf[a] * Gf[b])
            Xn = np.column_stack([ones, ga, gb])
            Xf = np.column_stack([Xn, prod])
            rss_n = np.sum((ys - Xn @ np.linalg.lstsq(Xn, ys, rcond=None)[0]) ** 2)
            rss_f = np.sum((ys - Xf @ np.linalg.lstsq(Xf, ys, rcond=None)[0]) ** 2)
            dof = n - Xf.shape[1]
            F = (rss_n - rss_f) / (rss_f / dof)
            p_ref = scipy.stats.f.sf(F, 1, dof)
            assert abs(r["inter_ps"][0, b] - p_ref) < 1e-8, (b, p_ref)


class TestMultiTraitMissing:
    """Per-trait missing phenotypes (round-1 'weak' item): grouped by
    missingness pattern, each group exact vs single-trait emmax on the
    observed subset."""

    def test_nan_traits_match_per_trait_subsets(self, small_dataset,
                                                kinship_small):
        from mixmogam_tpu.models import emmax
        from mixmogam_tpu.models.multitrait import emmax_multi_trait

        rng = np.random.default_rng(13)
        G = small_dataset["G"]
        y = small_dataset["y"]
        n = len(y)
        Y = np.stack([y, y + rng.normal(size=n), rng.normal(size=n)])
        # trait 1 and 2 share a missing pattern; trait 0 fully observed
        hole = rng.random(n) < 0.15
        Y[1, hole] = np.nan
        Y[2, hole] = np.nan
        K = kinship_small
        out = emmax_multi_trait(G, Y, K=K)
        assert out["dof"].shape == (3,)
        for t in range(3):
            keep = ~np.isnan(Y[t])
            ref = emmax(np.ascontiguousarray(G[:, keep]), Y[t][keep],
                        K=K[np.ix_(keep, keep)], stream=False)
            # SNPs monomorphic on the subset are masked (p=1) in both;
            # rtol: the two paths refine REML delta to slightly different
            # depths (esp-driven vs default grid refinement)
            np.testing.assert_allclose(out["ps"][t], ref["ps"],
                                       rtol=1e-5, atol=1e-8)
            assert abs(out["deltas"][t] - ref["delta"]) < 1e-4

    def test_fully_observed_unchanged(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.multitrait import emmax_multi_trait

        y = small_dataset["y"]
        Y = np.stack([y, np.roll(y, 5)])
        out = emmax_multi_trait(small_dataset["G"], Y, K=kinship_small)
        assert np.isscalar(out["dof"]) or np.ndim(out["dof"]) == 0

    def test_too_few_observed_raises(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.multitrait import emmax_multi_trait

        y = small_dataset["y"].copy()
        y[3:] = np.nan  # 3 observed samples
        with pytest.raises(ValueError, match="observed"):
            emmax_multi_trait(small_dataset["G"], y[None, :],
                              K=kinship_small)


class TestStepwiseEarlyStop:
    def test_early_stop_halts_forward(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        G, y, K = (small_dataset["G"], small_dataset["y"], kinship_small)
        full = emmax_step_wise(G, y, K=K, max_steps=6)
        es = emmax_step_wise(G, y, K=K, max_steps=6, early_stop=True)
        fwd_full = [s for s in full["steps"] if s["phase"] == "forward"
                    and np.isfinite(s.get("min_p", np.nan))]
        fwd_es = [s for s in es["steps"] if s["phase"] == "forward"
                  and np.isfinite(s.get("min_p", np.nan))]
        assert len(fwd_es) <= len(fwd_full)
        # identical prefix: early stop must not change the steps it runs
        for a, b in zip(fwd_es, fwd_full):
            assert a["min_p_snp"] == b["min_p_snp"]
        # stopped exactly at the first non-significant scan (if it did)
        bonf = es["bonf_threshold"]
        for s in fwd_es[:-1]:
            assert s["min_p"] <= bonf


class TestStreamedRotation:
    def test_rotate_streamed_matches_dense(self, small_dataset,
                                           kinship_small):
        import scipy.linalg

        from mixmogam_tpu.models.streaming import rotate_streamed_to_device

        G = small_dataset["G_int"].copy()
        rng = np.random.default_rng(4)
        G[rng.random(G.shape) < 0.1] = -1
        phi, U = scipy.linalg.eigh(kinship_small)
        got = np.asarray(rotate_streamed_to_device(G, U, np.float64,
                                                   tile=96))
        from mixmogam_tpu.models.emmax import _as_dosage

        want = _as_dosage(G, np.float64) @ U
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_stepwise_stored_path_unchanged(self, small_dataset,
                                            kinship_small):
        """The tiled stored-rotation build gives the same stepwise path
        as before (oracle parity is covered in test_models)."""
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        G, y, K = (small_dataset["G"], small_dataset["y"], kinship_small)
        stored = emmax_step_wise(G, y, K=K, max_steps=3)
        streamed = emmax_step_wise(G, y, K=K, max_steps=3,
                                   rot_budget_bytes=1)
        for a, b in zip(stored["steps"], streamed["steps"]):
            assert a["cofactors"] == b["cofactors"]
            if np.isfinite(a.get("min_p", np.nan)):
                assert abs(a["min_p"] - b["min_p"]) < 1e-9


class TestMultiTraitStreamed:
    def test_streamed_matches_incore(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.multitrait import emmax_multi_trait

        G = small_dataset["G_int"]
        y = small_dataset["y"]
        Y = np.stack([y, np.roll(y, 7), np.roll(y, 13)])
        K = kinship_small
        ref = emmax_multi_trait(G, Y, K=K)
        st = emmax_multi_trait(G, Y, K=K, stream_budget_bytes=1024)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-9)
        np.testing.assert_array_equal(st["mask"], ref["mask"])

    def test_streamed_float_nan_source(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.multitrait import emmax_multi_trait

        rng = np.random.default_rng(9)
        Gf = small_dataset["G"].copy()
        Gf[rng.random(Gf.shape) < 0.08] = np.nan
        y = small_dataset["y"]
        Y = np.stack([y, np.roll(y, 3)])
        ref = emmax_multi_trait(Gf, Y, K=kinship_small)
        st = emmax_multi_trait(Gf, Y, K=kinship_small,
                               stream_budget_bytes=1024)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-9)


class TestRescoreTop:
    """Two-stage scan: fast tier ranks, exact tier re-scores everything
    reported — reported hits carry exact-grade p-values."""

    def test_streamed_rescore_matches_exact(self, small_dataset,
                                            kinship_small):
        from mixmogam_tpu.models import emmax
        from mixmogam_tpu.models.streaming import emmax_streamed

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        exact = emmax(G_int, y, K=K, stream=False)
        fast = emmax_streamed(G_int, y, K=K, tile=128,
                              rotate_in_bf16="int8x2", rescore_top=25)
        idx = fast["rescored_idx"]
        assert len(idx) >= 25
        np.testing.assert_allclose(fast["ps"][idx], exact["ps"][idx],
                                   rtol=1e-10)
        np.testing.assert_allclose(fast["betas"][idx],
                                   exact["betas"][idx], rtol=1e-8)
        # the non-rescored bulk keeps fast-tier values (no silent rerun)
        rest = np.setdiff1d(np.arange(len(y)), idx)[:5]

    def test_incore_rescore(self, small_dataset, kinship_small):
        from mixmogam_tpu.models import emmax

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        exact = emmax(G_int, y, K=K, stream=False)
        fast = emmax(G_int, y, K=K, stream=False, precision="int8x2",
                     rescore_top=20)
        idx = fast["rescored_idx"]
        assert len(idx) >= 20
        np.testing.assert_allclose(fast["ps"][idx], exact["ps"][idx],
                                   rtol=1e-10)

    def test_exact_tier_rescore_noop(self, small_dataset, kinship_small):
        from mixmogam_tpu.models import emmax

        out = emmax(small_dataset["G_int"], small_dataset["y"],
                    K=kinship_small, stream=False, rescore_top=10)
        assert len(out["rescored_idx"]) == 0


class TestEmmaStreamed:
    def test_emma_streamed_matches_incore(self, tiny_dataset, kinship_tiny):
        from mixmogam_tpu.models.emma import emma

        G, y, K = (tiny_dataset["G"], tiny_dataset["y"], kinship_tiny)
        ref = emma(G, y, K=K, tile=64)
        st = emma(G, y, K=K, tile=64, stream_budget_bytes=1)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-10)
        np.testing.assert_allclose(st["deltas"], ref["deltas"], rtol=1e-8)

    def test_emma_streamed_int8_missing(self, kinship_small, small_dataset):
        from mixmogam_tpu.models.emma import emma

        rng = np.random.default_rng(6)
        G = small_dataset["G_int"][:120].copy()
        G[rng.random(G.shape) < 0.1] = -1
        y = small_dataset["y"]
        ref = emma(G, y, K=kinship_small, tile=64)
        st = emma(G, y, K=kinship_small, tile=64, stream_budget_bytes=1)
        np.testing.assert_allclose(st["ps"], ref["ps"], atol=1e-10)


class TestPackedTransport:
    """2-bit device-side unpack (ops.pack2): 4x less host->device traffic
    for streamed int8 tiles; bit-exact vs raw int8 transfers."""

    def test_unpack_device_roundtrip(self):
        from mixmogam_tpu import native
        from mixmogam_tpu.ops.pack2 import unpack_2bit_device

        rng = np.random.default_rng(0)
        G = rng.integers(0, 3, size=(37, 53)).astype(np.int8)
        G[rng.random(G.shape) < 0.2] = -1
        import jax.numpy as jnp

        out = np.asarray(unpack_2bit_device(jnp.asarray(native.pack_2bit(G)),
                                            G.shape[1]))
        np.testing.assert_array_equal(out, G)

    def test_kinship_packed_matches_raw(self, small_dataset):
        from mixmogam_tpu.ops.kinship import kinship

        G = small_dataset["G_int"]
        a = kinship(G, method="ibs", chunk=128, pack_transfer=False)
        b = kinship(G, method="ibs", chunk=128, pack_transfer=True)
        np.testing.assert_array_equal(a, b)  # integer-exact either way

    def test_kinship_diploid_packed(self):
        from mixmogam_tpu.data.simulate import simulate_genotypes
        from mixmogam_tpu.ops.kinship import kinship

        G, _, _ = simulate_genotypes(30, 100, ploidy=2, seed=5)
        a = kinship(G, method="ibs", chunk=33, pack_transfer=False)
        b = kinship(G, method="ibs", chunk=33, pack_transfer=True)
        np.testing.assert_array_equal(a, b)

    def test_streamed_scan_packed(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.streaming import emmax_streamed

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        a = emmax_streamed(G_int, y, K=K, tile=64, pack_transfer=False)
        b = emmax_streamed(G_int, y, K=K, tile=64, pack_transfer=True)
        np.testing.assert_allclose(a["ps"], b["ps"], atol=0)


class TestRunGwasMultiBatched:
    def _files(self, tmp_path, with_missing):
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.phenotype import PhenotypeData
        from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                                simulate_phenotype)

        G, ch, po = simulate_genotypes(80, 800, seed=31)
        gd = GenotypeData(G, ch, po, [f"a{i}" for i in range(80)])
        g = str(tmp_path / "g.csv")
        gd.write_csv(g)
        rng = np.random.default_rng(31)
        rows = ["ecotype_id,t1,t2"]
        y1, _ = simulate_phenotype(G, h2=0.6, n_causal=4, seed=31)
        y2 = rng.normal(size=80)
        for i in range(80):
            v2 = "" if (with_missing and rng.random() < 0.2) \
                else f"{y2[i]:.6f}"
            rows.append(f"a{i},{y1[i]:.6f},{v2}")
        p = str(tmp_path / "p.csv")
        with open(p, "w") as f:
            f.write("\n".join(rows) + "\n")
        return g, p

    def test_batched_matches_loop(self, tmp_path):
        from mixmogam_tpu.api import run_gwas_multi

        g, p = self._files(tmp_path, with_missing=False)
        loop = run_gwas_multi(g, p, min_mac=5, plots=False)
        bat = run_gwas_multi(g, p, min_mac=5, batched=True)
        for pid in loop:
            np.testing.assert_allclose(bat[pid]["scan"]["ps"],
                                       loop[pid]["scan"]["ps"],
                                       rtol=1e-5, atol=1e-8)

    def test_batched_with_missing_trait_values(self, tmp_path):
        from mixmogam_tpu.api import run_gwas, run_gwas_multi

        g, p = self._files(tmp_path, with_missing=True)
        bat = run_gwas_multi(g, p, min_mac=5, batched=True,
                             out_prefix=str(tmp_path / "o"))
        # per-pid reference run coordinates to ITS observed subset;
        # compare on the shared SNP set via positions
        ref = run_gwas(g, p, pid=2, min_mac=5, plots=False)
        r2 = bat[2]["result"]
        pos_ref = {int(q): i for i, q in
                   enumerate(ref["genotype"].positions)}
        sel = [i for i, q in enumerate(r2.positions)
               if int(q) in pos_ref]
        ref_idx = [pos_ref[int(q)] for q in r2.positions[sel]]
        lp_a = -np.log10(np.maximum(r2.scores[sel], 1e-300))
        lp_b = -np.log10(np.maximum(ref["scan"]["ps"][ref_idx], 1e-300))
        assert np.corrcoef(lp_a, lp_b)[0, 1] > 0.999
        assert (tmp_path / "o.pid1.pvals.csv").exists()


class TestReviewRound2Fixes:
    """Fixes from the round-2 self-review."""

    def test_triallelic_diploid_ranking(self, tmp_path):
        """True copy counts rank alleles: homozygous single-letter calls
        carry 2 copies under diploid (A=6 beats G=T=4 here)."""
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c,d,e,f,g\n"
                     "1,50,A,T,AT,AT,AT,AT,AT\n"  # diploid evidence first
                     "1,100,A,A,A,GT,GT,GT,GT\n")
        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.alleles[1].tolist()[0] == "A"  # major by true copies
        # homozygous-A samples keep dosage 0; GT carries the dropped
        # third allele -> missing
        assert gd.matrix[1].tolist()[:3] == [0, 0, 0]
        assert set(gd.matrix[1].tolist()[3:]) == {-1}

    def test_auto_streamed_missing_int8_resolves_exact(self, small_dataset,
                                                       kinship_small):
        """precision='auto' on a streamed int8 source WITH missing data
        must fall back to exact (used to resolve int8x3 and crash)."""
        from mixmogam_tpu.models.streaming import emmax_streamed

        rng = np.random.default_rng(8)
        G = small_dataset["G_int"].copy()
        G[rng.random(G.shape) < 0.1] = -1
        y, K = small_dataset["y"], kinship_small
        out = emmax_streamed(G, y, K=K, tile=64, precision="auto")
        assert out["precision_tier"] == "exact"
        assert np.isfinite(out["ps"]).all()

    def test_is_integer_dosage_rejects_missing_sentinel(self):
        from mixmogam_tpu.ops.scan import is_integer_dosage

        assert not is_integer_dosage(np.array([[0, 1, -1]], np.int8))
        assert is_integer_dosage(np.array([[0, 1, 2]], np.int8))

    def test_streamed_high_tier_rescore_runs(self, small_dataset,
                                             kinship_small):
        """rescore_top must fire for precision='high' in streamed mode
        (gate used to check only the rotate tier)."""
        from mixmogam_tpu.models import emmax
        from mixmogam_tpu.models.streaming import emmax_streamed

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        st = emmax_streamed(G_int, y, K=K, tile=64, precision="high",
                            rescore_top=15)
        assert len(st["rescored_idx"]) >= 15
        ref = emmax(G_int, y, K=K, stream=False)
        idx = st["rescored_idx"]
        np.testing.assert_allclose(st["ps"][idx], ref["ps"][idx],
                                   rtol=1e-9)


class TestFastTier:
    def test_fast_implies_rescore_and_exact_hits(self, small_dataset,
                                                 kinship_small):
        from mixmogam_tpu.models import emmax

        G_int = small_dataset["G_int"]
        y, K = small_dataset["y"], kinship_small
        fast = emmax(G_int, y, K=K, stream=False, precision="fast")
        # on CPU 'fast' resolves to exact (no TPU): rescore is a no-op
        # but the call must succeed and return a tier name
        assert fast["precision_tier"] in ("exact", "int8x2", "bf16")
        ref = emmax(G_int, y, K=K, stream=False)
        if fast["precision_tier"] == "exact":
            # 'fast' additionally factorizes K's eigh in f32 (ssyevd) —
            # measured |dp| ~ 1e-6 envelope (tests/test_fast_tier.py)
            np.testing.assert_allclose(fast["ps"], ref["ps"], atol=1e-4)
        else:
            idx = fast["rescored_idx"]
            assert len(idx) > 0
            np.testing.assert_allclose(fast["ps"][idx], ref["ps"][idx],
                                       rtol=1e-9)

    def test_fast_streamed(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.streaming import emmax_streamed

        out = emmax_streamed(small_dataset["G_int"], small_dataset["y"],
                             K=kinship_small, tile=64, precision="fast")
        assert np.isfinite(out["ps"]).all()


class TestSecondReviewFixes:
    def test_fast_resolves_int8x2_for_int_dosage(self):
        from mixmogam_tpu.ops.scan import resolve_precision

        G = np.array([[0, 1, 2]], np.int8)
        _, _, name = resolve_precision("fast", G=G, backend="tpu")
        assert name == "int8x2"
        _, _, name = resolve_precision("fast", G=G.astype(np.float64) + 0.5,
                                       backend="tpu")
        assert name == "bf16"
        _, _, name = resolve_precision("fast", G=G, backend="cpu")
        assert name == "exact"

    def test_early_stop_no_duplicate_final_record(self, small_dataset,
                                                  kinship_small):
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        es = emmax_step_wise(small_dataset["G"], small_dataset["y"],
                             K=kinship_small, max_steps=6, early_stop=True)
        fwd = [tuple(s["cofactors"]) for s in es["steps"]
               if s["phase"] == "forward"]
        assert len(fwd) == len(set(fwd)), "duplicate forward records"

    def test_from_result_scores_type_raises(self, small_dataset,
                                            kinship_small):
        from mixmogam_tpu.models.twosnp import emmax_two_snps
        from mixmogam_tpu.results.result import Result

        r = Result(np.random.default_rng(0).random(
            small_dataset["G"].shape[0]),
            np.ones(small_dataset["G"].shape[0], int),
            np.arange(small_dataset["G"].shape[0]),
            score_type="scores")
        with pytest.raises(ValueError, match="score_type"):
            emmax_two_snps(small_dataset["G"], small_dataset["y"],
                           K=kinship_small, from_result=r)

    def test_pallas_int8_rounds_float_input(self, small_dataset,
                                            kinship_small):
        from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan_int8
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all

        import jax.numpy as jnp

        y = small_dataset["y"].astype(np.float32)
        K = kinship_small.astype(np.float32)
        null = fit_null_model(y, np.ones((len(y), 1), np.float32), K=K)
        rot = build_rotated_null(null, rotate_dtype="int8x3")
        # float dosages with representation error: 2 - 1e-7 must ROUND
        # to 2 (the XLA tier's behavior), not truncate to 1
        Gf = small_dataset["G_int"][:64].astype(np.float32) * (1 - 5e-8)
        ref = emmax_scan_all(jnp.asarray(Gf), rot, tile=64)
        pal = pallas_rotate_scan_int8(Gf, rot, tm=64, nb=128)
        np.testing.assert_allclose(np.asarray(pal["f_stats"]),
                                   np.asarray(ref["f_stats"]),
                                   rtol=1e-4, atol=1e-4)

    def test_rotate_streamed_single_shape_overlap(self, small_dataset,
                                                  kinship_small):
        import scipy.linalg

        from mixmogam_tpu.models.streaming import rotate_streamed_to_device
        from mixmogam_tpu.models.emmax import _as_dosage

        G = small_dataset["G_int"][:130]  # 130 % 48 != 0 -> overlap path
        phi, U = scipy.linalg.eigh(kinship_small)
        got = np.asarray(rotate_streamed_to_device(G, U, np.float64,
                                                   tile=48))
        want = _as_dosage(G, np.float64) @ U
        np.testing.assert_allclose(got, want, atol=1e-10)
