"""Parity + behavior tests for EMMA exact, stepwise MLMM, multi-trait,
permutation, and two-SNP scans (SURVEY.md §4.2/§4.4)."""

import numpy as np
import pytest

from mixmogam_tpu import oracle
from mixmogam_tpu.models.emma import emma
from mixmogam_tpu.models.emmax import emmax
from mixmogam_tpu.models.stepwise import emmax_step_wise
from mixmogam_tpu.models.multitrait import emmax_multi_trait
from mixmogam_tpu.models.permutation import emmax_perm_test
from mixmogam_tpu.models.twosnp import emmax_two_snps


class TestEmmaDevice:
    def test_emma_parity(self, tiny_dataset, kinship_tiny):
        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        o = oracle.emma_scan(G, y, K)
        d = emma(G, y, K=K, tile=64)
        fin = np.isfinite(o["deltas"])
        assert np.max(np.abs(np.log(o["deltas"][fin])
                             - np.log(d["deltas"][fin]))) < 1e-5
        assert np.max(np.abs(o["ps"] - d["ps"])) < 1e-6
        assert np.max(np.abs(o["betas"] - d["betas"])) < 1e-6

    def test_emma_with_cofactor(self, tiny_dataset, kinship_tiny):
        G, y, K = tiny_dataset["G"][:20], tiny_dataset["y"], kinship_tiny
        X0 = np.hstack([np.ones((len(y), 1)), tiny_dataset["G"][25][:, None]])
        o = oracle.emma_scan(G, y, K, X0=X0)
        d = emma(G, y, K=K, X0=X0, tile=32)
        assert np.max(np.abs(o["ps"] - d["ps"])) < 1e-6

    def test_emma_degenerate_snp(self, tiny_dataset, kinship_tiny):
        y, K = tiny_dataset["y"], kinship_tiny
        G = np.vstack([np.ones((1, len(y))), tiny_dataset["G"][:3]])
        d = emma(G, y, K=K, tile=8)
        assert d["ps"][0] == 1.0 and not d["mask"][0]

    def test_emma_lrt_mode(self, tiny_dataset, kinship_tiny):
        G, y, K = tiny_dataset["G"][:16], tiny_dataset["y"], kinship_tiny
        d = emma(G, y, K=K, tile=16, test="lrt")
        assert np.all((d["ps"] >= 0) & (d["ps"] <= 1))
        # LRT and F p-values should broadly agree in rank
        df = emma(G, y, K=K, tile=16, test="f")
        assert np.argmin(d["ps"]) == np.argmin(df["ps"])


class TestEmmaxAnova:
    def test_diploid_categorical_equals_oneway_anova_at_identity_k(self):
        """With K=I the 2-dof categorical EMMAX test must reproduce the
        classic one-way ANOVA over the three genotype classes."""
        from mixmogam_tpu.data.simulate import simulate_genotypes
        from mixmogam_tpu.models.emmax import emmax_anova

        rng = np.random.default_rng(0)
        G, _, _ = simulate_genotypes(80, 200, ploidy=2, seed=6)
        y = rng.normal(size=80)
        d = emmax_anova(G, y, K=np.eye(80), tile=64)
        o = oracle.anova_scan(G, y)
        assert np.max(np.abs(d["ps"] - o["ps"])) < 1e-6

    def test_binary_reduces_to_emmax(self, small_dataset, kinship_small):
        from mixmogam_tpu.models.emmax import emmax_anova

        G, y, K = small_dataset["G_int"][:40], small_dataset["y"], \
            kinship_small
        a = emmax_anova(G, y, K=K)
        b = emmax(G, y, K=K)
        np.testing.assert_allclose(a["ps"], b["ps"], atol=1e-10)


class TestStepwiseDevice:
    def test_full_path_parity(self, tiny_dataset, kinship_tiny):
        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        o = oracle.mlmm_step_wise(G, y, K, max_steps=3)
        d = emmax_step_wise(G, y, K=K, max_steps=3, tile=64)
        assert len(o["steps"]) == len(d["steps"])
        for so, sd in zip(o["steps"], d["steps"]):
            assert so["cofactors"] == sd["cofactors"]
            assert abs(so["delta"] - sd["delta"]) \
                < 1e-5 * max(so["delta"], 1.0)
            assert abs(so["bic"] - sd["bic"]) < 1e-5
            assert abs(so["ebic"] - sd["ebic"]) < 1e-5
            assert abs(so["mbic"] - sd["mbic"]) < 1e-5
            np.testing.assert_allclose(so["cofactor_ps"], sd["cofactor_ps"],
                                       atol=1e-6)
        assert ({k: v["cofactors"] for k, v in o["selected"].items()}
                == {k: v["cofactors"] for k, v in d["selected"].items()})

    def test_streamed_stepwise_matches_stored(self, tiny_dataset,
                                              kinship_tiny):
        """rot_budget_bytes=0 forces the streaming path (int8 tiles,
        per-step rotation) — must reproduce the stored-G_rot path."""
        G_int = tiny_dataset["G_int"]
        y, K = tiny_dataset["y"], kinship_tiny
        a = emmax_step_wise(G_int, y, K=K, max_steps=2, tile=32)
        b = emmax_step_wise(G_int, y, K=K, max_steps=2, tile=32,
                            rot_budget_bytes=0)
        for sa, sb in zip(a["steps"], b["steps"]):
            assert sa["cofactors"] == sb["cofactors"]
            assert abs(sa["delta"] - sb["delta"]) < 1e-8
        assert ({k: v["cofactors"] for k, v in a["selected"].items()}
                == {k: v["cofactors"] for k, v in b["selected"].items()})

    def test_per_step_h2_trace(self, tiny_dataset, kinship_tiny):
        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        d = emmax_step_wise(G, y, K=K, max_steps=2, tile=64)
        for s in d["steps"]:
            assert 0.0 <= s["pseudo_heritability"] <= 1.0


class TestMultiTrait:
    def test_matches_per_trait_emmax(self, small_dataset, kinship_small):
        G, K = small_dataset["G"][:120], kinship_small
        rng = np.random.default_rng(3)
        n = G.shape[1]
        Y = np.stack([small_dataset["y"],
                      rng.normal(size=n),
                      small_dataset["y"] * 0.5 + rng.normal(size=n)])
        mt = emmax_multi_trait(G, Y, K=K)
        for t in range(Y.shape[0]):
            single = emmax(G, Y[t], K=K)
            assert abs(mt["deltas"][t] - single["delta"]) \
                < 1e-5 * max(single["delta"], 1.0)
            np.testing.assert_allclose(mt["ps"][t], single["ps"], atol=1e-6)

    def test_trait_batch_shapes(self, small_dataset, kinship_small):
        G, K = small_dataset["G"][:50], kinship_small
        Y = np.tile(small_dataset["y"], (5, 1))
        mt = emmax_multi_trait(G, Y, K=K, tile=16)
        assert mt["ps"].shape == (5, 50)
        # identical traits -> identical results
        for t in range(1, 5):
            np.testing.assert_allclose(mt["ps"][t], mt["ps"][0], atol=1e-12)


class TestPermutation:
    def test_threshold_sane(self, small_dataset, kinship_small):
        G, y, K = small_dataset["G"][:200], small_dataset["y"], kinship_small
        r = emmax_perm_test(G, y, K=K, num_perm=30, seed=1, tile=64)
        assert r["min_ps"].shape == (30,)
        assert np.all((r["min_ps"] >= 0) & (r["min_ps"] <= 1))
        # genome-wide threshold must be far below nominal alpha
        assert r["threshold"] < 0.05
        # and the permutation min-p distribution should not be degenerate
        assert len(np.unique(np.round(r["min_ps"], 12))) > 5

    def test_lm_permutation_variant(self, small_dataset):
        """K=None -> identity whitening (linear-model permutation test)."""
        G, y = small_dataset["G"][:100], small_dataset["y"]
        r = emmax_perm_test(G, y, K=None, num_perm=20, tile=64)
        assert r["min_ps"].shape == (20,)
        assert 0 < r["threshold"] < 0.05

    def test_perm_matches_direct_scan(self, small_dataset, kinship_small):
        """Permutation #0 with the identity permutation must reproduce the
        real scan's max F."""
        G, y, K = small_dataset["G"][:100], small_dataset["y"], kinship_small

        class _Rng:
            def __init__(self):
                self.first = True

            def permutation(self, n):
                if self.first:
                    self.first = False
                    return np.arange(n)
                return np.random.default_rng(0).permutation(n)

        import mixmogam_tpu.models.permutation as mp

        orig = np.random.default_rng
        np.random.default_rng = lambda seed=None: _Rng()
        try:
            r = mp.emmax_perm_test(G, y, K=K, num_perm=2, tile=64)
        finally:
            np.random.default_rng = orig
        direct = emmax(G, y, K=K)
        assert np.isclose(np.min(r["min_ps"].min()),
                          np.min(direct["ps"]), rtol=1e-6) \
            or r["min_ps"].min() <= np.min(direct["ps"]) + 1e-12


class TestTwoSnp:
    def test_conditional_matches_cofactor_scan(self, tiny_dataset,
                                               kinship_tiny):
        G, y, K = tiny_dataset["G"], tiny_dataset["y"], kinship_tiny
        a = 5
        r = emmax_two_snps(G, y, K=K, focal_idx=[a], tile=64)
        X0 = np.hstack([np.ones((len(y), 1)), G[a][:, None]])
        cond = emmax(G, y, K=K, X0=X0)
        # two_snps keeps the GLOBAL null delta; compare against a scan at
        # that same delta by checking the focal SNP itself is masked and
        # correlation of the rest is essentially 1
        assert r["cond_ps"][0, a] == 1.0
        mask = np.arange(len(G)) != a
        lp1 = -np.log10(np.maximum(r["cond_ps"][0, mask], 1e-300))
        lp2 = -np.log10(np.maximum(cond["ps"][mask], 1e-300))
        assert np.corrcoef(lp1, lp2)[0, 1] > 0.99

    def test_interaction_detects_epistasis(self, kinship_tiny):
        """Synthetic pure-interaction phenotype -> the interaction p of the
        causal pair beats the marginal ps."""
        rng = np.random.default_rng(0)
        n = 50
        G = (rng.random((30, n)) < 0.5).astype(np.float64)
        y = 2.0 * (G[3] * G[17]) + 0.3 * rng.normal(size=n)
        K = np.eye(n)
        r = emmax_two_snps(G, y, K=K, focal_idx=[3], tile=32)
        assert r["inter_ps"][0, 17] < 1e-4
