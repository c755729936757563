"""Simulated GWAS datasets (benchmark configs in BASELINE.json are
simulated; the reference ships real Arabidopsis data instead, which we
cannot redistribute — simulation covers the same shapes)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def simulate_genotypes(n_samples: int, n_snps: int, ploidy: int = 1,
                       maf_low: float = 0.05, maf_high: float = 0.5,
                       n_pops: int = 3, fst: float = 0.1,
                       missing_rate: float = 0.0,
                       seed: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Structured population genotypes (Balding-Nichols model), so kinship
    actually matters. Returns (G, chromosomes, positions); G is (M, n) int8
    with -1 for missing."""
    rng = np.random.default_rng(seed)
    p_anc = rng.uniform(maf_low, maf_high, size=n_snps)
    a = p_anc * (1.0 - fst) / fst
    b = (1.0 - p_anc) * (1.0 - fst) / fst
    pop_freqs = rng.beta(a, b, size=(n_pops, n_snps))
    pop = rng.integers(0, n_pops, size=n_samples)
    pf = pop_freqs[pop, :]  # (n, M)
    draws = rng.random((ploidy, n_samples, n_snps))
    G = (draws < pf[None, :, :]).sum(axis=0).T.astype(np.int8)  # (M, n)
    if missing_rate > 0:
        miss = rng.random(G.shape) < missing_rate
        G[miss] = -1
    n_chrom = 5
    chromosomes = (np.arange(n_snps) * n_chrom // n_snps + 1).astype(np.int32)
    positions = np.zeros(n_snps, dtype=np.int64)
    for c in range(1, n_chrom + 1):
        mask = chromosomes == c
        positions[mask] = np.sort(rng.integers(1, 30_000_000, size=mask.sum()))
    return G, chromosomes, positions


def simulate_phenotype(G: np.ndarray, h2: float = 0.5, n_causal: int = 10,
                       causal_effect: float = 0.0, K: Optional[np.ndarray] = None,
                       seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Phenotype from the LMM generative model: y = G_c beta + u + e with
    u ~ N(0, sg2 K) (polygenic background; if K is None a random dense
    polygenic term from all SNPs is used) and var tuned so heritability
    is ~h2. Returns (y, causal_idx)."""
    rng = np.random.default_rng(seed + 1)
    M, n = G.shape
    Gf = np.where(G < 0, np.nan, G).astype(np.float64)
    mu = np.nanmean(Gf, axis=1)
    idx = np.where(np.isnan(Gf))
    Gf[idx] = mu[idx[0]]

    causal = rng.choice(M, size=min(n_causal, M), replace=False)
    beta = rng.normal(0, 1.0, size=len(causal))
    if causal_effect:
        beta = np.sign(beta) * causal_effect
    fixed = Gf[causal].T @ beta if len(causal) else np.zeros(n)

    if K is not None:
        L = np.linalg.cholesky(K + 1e-6 * np.eye(n))
        u = L @ rng.normal(size=n)
    else:
        w = rng.normal(size=M) / np.sqrt(M)
        u = Gf.T @ w
    u = (u - u.mean())
    su = u.std() or 1.0
    e = rng.normal(size=n)
    y = fixed + np.sqrt(h2) * u / su + np.sqrt(1 - h2) * e
    return y, causal
