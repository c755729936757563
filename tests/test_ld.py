"""LD r^2 + greedy clumping (results/ld.py) — round-3 extension."""

import numpy as np

from mixmogam_tpu.results.ld import clump_hits, ld_r2


def _corr_data(seed=0, n=200):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 2, n).astype(np.int8)
    flip = rng.random(n) < 0.05
    proxy = np.where(flip, 1 - base, base).astype(np.int8)  # high LD
    indep = rng.integers(0, 2, n).astype(np.int8)
    mono = np.zeros(n, dtype=np.int8)
    G = np.stack([base, proxy, indep, mono])
    return G


class TestLdR2:
    def test_r2_structure(self):
        G = _corr_data()
        r2 = ld_r2(G, [0, 1, 2, 3])
        assert r2[0, 0] == 1.0
        assert r2[0, 1] > 0.7          # proxy in high LD
        assert r2[0, 2] < 0.2          # independent
        assert r2[0, 3] == 0.0         # monomorphic -> 0 off-diagonal
        assert r2[3, 3] == 1.0
        np.testing.assert_allclose(r2, r2.T, atol=1e-12)

    def test_r2_matches_numpy_corrcoef(self):
        rng = np.random.default_rng(3)
        G = rng.integers(0, 3, (5, 100)).astype(np.int8)
        r2 = ld_r2(G, np.arange(5))
        ref = np.corrcoef(G.astype(float)) ** 2
        np.testing.assert_allclose(r2, ref, atol=1e-12)

    def test_missing_imputed(self):
        G = _corr_data(1).copy()
        G[0, :5] = -1
        r2 = ld_r2(G, [0, 1])
        assert 0.5 < r2[0, 1] <= 1.0


class TestClump:
    def test_clumping_groups_linked_hits(self):
        G = _corr_data(2)
        ps = np.array([1e-10, 1e-8, 1e-9, 0.5])
        chroms = np.array([1, 1, 1, 1])
        poss = np.array([1000, 2000, 3000, 4000])
        clumps = clump_hits(ps, G, chroms, poss, p_threshold=1e-4,
                            r2_threshold=0.5, window_bp=10_000)
        assert clumps[0]["lead"] == 0
        assert clumps[0]["members"] == [1]     # proxy absorbed
        assert clumps[1]["lead"] == 2          # independent = own clump
        assert clumps[1]["members"] == []

    def test_window_respected(self):
        G = _corr_data(4)
        ps = np.array([1e-10, 1e-8, 0.9, 0.9])
        chroms = np.array([1, 1, 1, 1])
        poss = np.array([1000, 900_000, 5000, 6000])  # proxy far away
        clumps = clump_hits(ps, G, chroms, poss, p_threshold=1e-4,
                            window_bp=10_000)
        assert len(clumps) == 2                # LD but outside window
        assert clumps[0]["members"] == []

    def test_chromosome_respected(self):
        G = _corr_data(5)
        ps = np.array([1e-10, 1e-8, 0.9, 0.9])
        chroms = np.array([1, 2, 1, 1])
        poss = np.array([1000, 1000, 5000, 6000])
        clumps = clump_hits(ps, G, chroms, poss, p_threshold=1e-4)
        assert len(clumps) == 2

    def test_empty_when_nothing_significant(self):
        G = _corr_data(6)
        ps = np.full(4, 0.5)
        assert clump_hits(ps, G, np.ones(4), np.arange(4)) == []

    def test_resident_genome_source(self):
        from mixmogam_tpu.models.resident import ResidentGenome

        G = _corr_data(7)
        rg = ResidentGenome.from_source(G, tile=4)
        ps = np.array([1e-10, 1e-8, 1e-9, 0.5])
        a = clump_hits(ps, rg, np.ones(4), np.array([1, 2, 3, 4]) * 1000,
                       p_threshold=1e-4)
        b = clump_hits(ps, G, np.ones(4), np.array([1, 2, 3, 4]) * 1000,
                       p_threshold=1e-4)
        assert a == b


class TestResultClump:
    def test_result_clump_method(self):
        from mixmogam_tpu.results.result import Result

        G = _corr_data(8)
        r = Result(np.array([1e-10, 1e-8, 1e-9, 0.5]),
                   np.ones(4, dtype=int), np.array([1, 2, 3, 4]) * 1000)
        clumps = r.clump(G, p_threshold=1e-4, window_bp=10_000)
        assert clumps[0]["lead"] == 0 and clumps[0]["members"] == [1]

    def test_result_clump_requires_pvals(self):
        import pytest

        from mixmogam_tpu.results.result import Result

        G = _corr_data(9)
        r = Result(np.array([1.0, 2.0, 3.0, 4.0]), np.ones(4, dtype=int),
                   np.arange(4), score_type="scores")
        with pytest.raises(ValueError, match="p-values"):
            r.clump(G)
