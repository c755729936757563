"""Fixed-effects per-SNP tests (SURVEY.md A.6; reference:
linear_models.linear_model / anova + Kruskal-Wallis).

All three are matmul-shaped on device: OLS reuses the EMMAX scan kernel
with identity whitening; ANOVA and Kruskal-Wallis reduce per-genotype-class
sums with indicator-matrix matmuls (one (m,n)x(n,) product per class) —
no Python loop over SNPs."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixmogam_tpu.ops.eigen import orthonormal_basis
from mixmogam_tpu.ops.scan import RotatedNull, emmax_scan_all
from mixmogam_tpu.ops.stats import f_sf_host, chi2_sf_host
from mixmogam_tpu.models.emmax import _as_design, _as_dosage


def _identity_rot(y: np.ndarray, X0: np.ndarray, dtype) -> RotatedNull:
    n, q = X0.shape
    yd = jnp.asarray(y, dtype=dtype)
    X0d = jnp.asarray(X0, dtype=dtype)
    Q0 = orthonormal_basis(X0d)
    y_res = yd - Q0 @ (Q0.T @ yd)
    rss0 = y_res @ y_res
    ones = jnp.ones(n, dtype=dtype)
    # W is never read on the pre_rotated path — don't allocate an n x n
    # identity (400 MB at n=10k)
    return RotatedNull(W=jnp.zeros((0, 0), dtype=dtype), sd=ones, Q0=Q0,
                       y_res=y_res, rss0=rss0,
                       dof=jnp.asarray(n - q - 1, dtype=dtype))


def linear_model(G, y, X0: Optional[np.ndarray] = None, dtype=None,
                 tile: int = 8192, with_betas: bool = True
                 ) -> Dict[str, np.ndarray]:
    """Per-SNP OLS F-test (reference: linear_model): the EMMAX kernel with
    identity whitening (pre_rotated=True skips the rotation matmul)."""
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    Gf = _as_dosage(G, dtype)
    rot = _identity_rot(y, X0, dtype)
    d = emmax_scan_all(jnp.asarray(Gf), rot, tile=tile, pre_rotated=True)
    f_stats = np.asarray(d["f_stats"], dtype=np.float64)
    dof = int(rot.dof)
    ps = np.where(np.asarray(d["mask"]), f_sf_host(f_stats, 1.0, dof), 1.0)
    out = {"ps": ps, "f_stats": f_stats, "mask": np.asarray(d["mask"]),
           "dof": dof}
    if with_betas:
        out["betas"] = np.asarray(d["betas"], dtype=np.float64)
        out["var_perc"] = np.asarray(d["var_perc"], dtype=np.float64)
    return out


@functools.partial(jax.jit, static_argnames=("n_classes",))
def _class_sums(G, w, n_classes: int):
    """Per-SNP, per-genotype-class counts and weighted sums via indicator
    matmuls. G: (m, n) int dosages (<0 = missing); w: (n,) weights.
    Returns (counts (m, C), sums (m, C))."""
    outs_c, outs_s = [], []
    ones = jnp.ones(G.shape[1], dtype=w.dtype)
    for g in range(n_classes):
        ind = (G == g).astype(w.dtype)
        outs_c.append(ind @ ones)
        outs_s.append(ind @ w)
    return jnp.stack(outs_c, axis=1), jnp.stack(outs_s, axis=1)


def _as_classes(G: np.ndarray) -> np.ndarray:
    """int8 genotype classes with -1 = missing. Float input: NaN (the
    package's float missing convention) -> -1, fractional (mean-imputed)
    dosages classify by NEAREST class — the same documented choice as
    emmax_anova's diploid path. Without this, NaN->int8 is an undefined
    cast that silently lands missing samples in class 0."""
    if np.issubdtype(G.dtype, np.integer):
        return G.astype(np.int8)
    miss = np.isnan(G)
    return np.where(miss, -1, np.rint(np.where(miss, 0, G))).astype(np.int8)


def _infer_ploidy(G: np.ndarray) -> int:
    mx = (np.nanmax(G, initial=0) if np.issubdtype(G.dtype, np.floating)
          else G.max(initial=0))
    return 2 if mx > 1 else 1


def anova(G, y, ploidy: Optional[int] = None, dtype=None
          ) -> Dict[str, np.ndarray]:
    """Per-SNP one-way ANOVA over genotype classes (reference: anova)."""
    from mixmogam_tpu.data.genotype import GenotypeData

    if isinstance(G, GenotypeData):
        ploidy = G.ploidy if ploidy is None else ploidy
        G = G.matrix
    G = _as_classes(np.asarray(G))
    if ploidy is None:
        ploidy = _infer_ploidy(G)
    C = ploidy + 1
    y = np.asarray(y, dtype=np.float64).ravel()
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    Gd = jnp.asarray(G)
    yd = jnp.asarray(y, dtype=dtype)
    cnt, s1 = _class_sums(Gd, yd, C)
    _, s2 = _class_sums(Gd, yd * yd, C)
    cnt = np.asarray(cnt, dtype=np.float64)
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    N = cnt.sum(axis=1)
    T = s1.sum(axis=1)
    ss_tot = s2.sum(axis=1) - T**2 / np.maximum(N, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ssb = np.where(cnt > 0, s1**2 / np.maximum(cnt, 1), 0.0).sum(axis=1) \
            - T**2 / np.maximum(N, 1)
    ssw = np.maximum(ss_tot - ssb, 0.0)
    k = (cnt > 0).sum(axis=1)
    d1 = np.maximum(k - 1, 1)
    d2 = np.maximum(N - k, 1)
    valid = (k >= 2) & (ssw > 0) & (N - k > 0)
    f = np.where(valid, (ssb / d1) / np.maximum(ssw / d2, 1e-300), 0.0)
    ps = np.where(valid, f_sf_host(f, d1, d2), 1.0)
    return {"ps": ps, "f_stats": f, "dof1": d1, "dof2": d2}


def kruskal_wallis(G, y, ploidy: Optional[int] = None, dtype=None
                   ) -> Dict[str, np.ndarray]:
    """Per-SNP Kruskal-Wallis with tie correction (SURVEY.md A.6).

    Fast path (no missing genotypes): one global rank vector + class-sum
    matmuls. With missing genotypes the per-SNP sample sets differ, so
    ranks are recomputed per SNP on host (exact, slower)."""
    import scipy.stats

    from mixmogam_tpu.data.genotype import GenotypeData

    if isinstance(G, GenotypeData):
        ploidy = G.ploidy if ploidy is None else ploidy
        G = G.matrix
    G = _as_classes(np.asarray(G))
    if ploidy is None:
        ploidy = _infer_ploidy(G)
    C = ploidy + 1
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if (G < 0).any():
        from mixmogam_tpu.oracle.glm import kruskal_wallis_scan

        out = {"ps": np.ones(G.shape[0]), "stats": np.zeros(G.shape[0])}
        for j in range(G.shape[0]):
            keep = G[j] >= 0
            r = kruskal_wallis_scan(G[j:j + 1, keep], y[keep])
            out["ps"][j] = r["ps"][0]
            out["stats"][j] = r["stats"][0]
        return out
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    ranks = scipy.stats.rankdata(y)
    # tie correction shared by all SNPs (same sample set everywhere)
    _, t = np.unique(y, return_counts=True)
    tie_c = 1.0 - np.sum(t**3 - t) / max(n**3 - n, 1)
    cnt, rsum = _class_sums(jnp.asarray(G),
                            jnp.asarray(ranks, dtype=dtype), C)
    cnt = np.asarray(cnt, dtype=np.float64)
    rsum = np.asarray(rsum, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        h = 12.0 / (n * (n + 1)) * np.where(
            cnt > 0, rsum**2 / np.maximum(cnt, 1), 0.0).sum(axis=1) \
            - 3.0 * (n + 1)
    k = (cnt > 0).sum(axis=1)
    valid = (k >= 2) & (tie_c > 0)
    h = np.where(valid, h / tie_c, 0.0)
    ps = np.where(valid, chi2_sf_host(h, np.maximum(k - 1, 1)), 1.0)
    return {"ps": ps, "stats": h}
